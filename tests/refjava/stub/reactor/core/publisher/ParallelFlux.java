package reactor.core.publisher;

import org.reactivestreams.Publisher;

import java.util.ArrayList;
import java.util.List;
import java.util.function.Function;
import java.util.function.Predicate;

/** Synchronous stand-in: "parallel" rails are evaluated sequentially. */
public class ParallelFlux<T> {
    final List<T> items;

    ParallelFlux(List<T> items) {
        this.items = items;
    }

    public <R> ParallelFlux<R> map(Function<? super T, ? extends R> f) {
        List<R> out = new ArrayList<>(items.size());
        for (T t : items) out.add(f.apply(t));
        return new ParallelFlux<>(out);
    }

    public ParallelFlux<T> filter(Predicate<? super T> p) {
        List<T> out = new ArrayList<>();
        for (T t : items) if (p.test(t)) out.add(t);
        return new ParallelFlux<>(out);
    }

    public <R> ParallelFlux<R> flatMap(Function<? super T, ? extends Publisher<? extends R>> f) {
        List<R> out = new ArrayList<>();
        for (T t : items) out.addAll(Flux.drain(f.apply(t)));
        return new ParallelFlux<>(out);
    }

    public ParallelFlux<T> runOn(reactor.core.scheduler.Scheduler scheduler) {
        return this;
    }

    public Flux<T> sequential() {
        return new Flux<>(items);
    }
}
