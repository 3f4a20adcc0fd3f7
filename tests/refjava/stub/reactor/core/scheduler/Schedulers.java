package reactor.core.scheduler;

import java.util.concurrent.ExecutorService;

public final class Schedulers {
    private Schedulers() { }

    public static Scheduler fromExecutorService(ExecutorService executorService) {
        return new Scheduler() { };
    }
}
