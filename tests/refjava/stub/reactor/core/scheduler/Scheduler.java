package reactor.core.scheduler;

/** Opaque scheduler handle — concurrency is a no-op in the stub. */
public interface Scheduler {
}
