package reactor.core.publisher;

import org.reactivestreams.Publisher;
import org.reactivestreams.Subscriber;
import org.reactivestreams.Subscription;

import java.util.ArrayList;
import java.util.List;
import java.util.function.BiFunction;
import java.util.function.Function;
import java.util.function.Predicate;
import java.util.function.Supplier;
import java.util.stream.Stream;

/**
 * Synchronous, eager, list-backed stand-in for reactor-core's Flux —
 * just enough public API surface for the reference library to compile
 * and produce verdict-identical results. Concurrency hints
 * (subscribeOn/parallel) are no-ops: validation verdicts are pure
 * functions of the data, so a sequential evaluation returns the same
 * results the reactive pipeline would.
 */
public class Flux<T> implements Publisher<T> {
    final List<T> items;

    Flux(List<T> items) {
        this.items = items;
    }

    public static <T> Flux<T> fromIterable(Iterable<? extends T> it) {
        List<T> out = new ArrayList<>();
        for (T t : it) out.add(t);
        return new Flux<>(out);
    }

    public static <T> Flux<T> fromStream(Stream<? extends T> s) {
        List<T> out = new ArrayList<>();
        s.forEach(out::add);
        return new Flux<>(out);
    }

    public static Flux<Integer> range(int start, int count) {
        List<Integer> out = new ArrayList<>(count);
        for (int i = 0; i < count; i++) out.add(start + i);
        return new Flux<>(out);
    }

    @SafeVarargs
    public static <T> Flux<T> just(T... values) {
        List<T> out = new ArrayList<>();
        for (T t : values) out.add(t);
        return new Flux<>(out);
    }

    public static <T> Flux<T> from(Publisher<? extends T> p) {
        return new Flux<>(drain(p));
    }

    public static <T> Flux<T> defer(Supplier<? extends Publisher<T>> supplier) {
        return new Flux<>(drain(supplier.get()));
    }

    public static <T> Flux<T> empty() {
        return new Flux<>(new ArrayList<>());
    }

    @SuppressWarnings("unchecked")
    static <T> List<T> drain(Publisher<? extends T> p) {
        if (p instanceof Flux) {
            return new ArrayList<>(((Flux<T>) p).items);
        }
        if (p instanceof Mono) {
            Mono<T> m = (Mono<T>) p;
            List<T> out = new ArrayList<>();
            if (m.hasValue) out.add(m.value);
            return out;
        }
        List<T> out = new ArrayList<>();
        p.subscribe(new Subscriber<T>() {
            public void onSubscribe(Subscription s) { s.request(Long.MAX_VALUE); }
            public void onNext(T t) { out.add(t); }
            public void onError(Throwable t) { throw new RuntimeException(t); }
            public void onComplete() { }
        });
        return out;
    }

    public <R> Flux<R> map(Function<? super T, ? extends R> f) {
        List<R> out = new ArrayList<>(items.size());
        for (T t : items) out.add(f.apply(t));
        return new Flux<>(out);
    }

    public Flux<T> filter(Predicate<? super T> p) {
        List<T> out = new ArrayList<>();
        for (T t : items) if (p.test(t)) out.add(t);
        return new Flux<>(out);
    }

    public <R> Flux<R> flatMap(Function<? super T, ? extends Publisher<? extends R>> f) {
        List<R> out = new ArrayList<>();
        for (T t : items) out.addAll(drain(f.apply(t)));
        return new Flux<>(out);
    }

    public <A> Mono<A> reduce(A initial, BiFunction<A, ? super T, A> accumulator) {
        A acc = initial;
        for (T t : items) acc = accumulator.apply(acc, t);
        return Mono.just(acc);
    }

    public Mono<List<T>> collectList() {
        return Mono.just(new ArrayList<>(items));
    }

    public ParallelFlux<T> parallel() {
        return new ParallelFlux<>(items);
    }

    public Flux<T> subscribeOn(reactor.core.scheduler.Scheduler scheduler) {
        return this;
    }

    public <R> Flux<R> transform(Function<? super Flux<T>, ? extends Publisher<R>> f) {
        return new Flux<>(drain(f.apply(this)));
    }

    public Flux<T> concatWith(Publisher<? extends T> other) {
        List<T> out = new ArrayList<>(items);
        out.addAll(drain(other));
        return new Flux<>(out);
    }

    public Stream<T> toStream() {
        return items.stream();
    }

    @Override
    public void subscribe(Subscriber<? super T> s) {
        s.onSubscribe(new Subscription() {
            public void request(long n) { }
            public void cancel() { }
        });
        for (T t : items) s.onNext(t);
        s.onComplete();
    }
}
