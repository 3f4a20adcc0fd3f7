package reactor.core.publisher;

import org.reactivestreams.Publisher;
import org.reactivestreams.Subscriber;
import org.reactivestreams.Subscription;

import java.util.List;
import java.util.concurrent.CompletableFuture;
import java.util.function.Function;
import java.util.function.Predicate;

/** Synchronous stand-in for reactor-core's Mono (see Flux). */
public class Mono<T> implements Publisher<T> {
    final T value;
    final boolean hasValue;

    Mono(T value, boolean hasValue) {
        this.value = value;
        this.hasValue = hasValue;
    }

    public static <T> Mono<T> just(T value) {
        return new Mono<>(value, true);
    }

    public static <T> Mono<T> empty() {
        return new Mono<>(null, false);
    }

    public static <T> Mono<T> from(Publisher<? extends T> p) {
        List<T> drained = Flux.drain(p);
        return drained.isEmpty() ? empty() : just(drained.get(0));
    }

    public <R> Mono<R> map(Function<? super T, ? extends R> f) {
        return hasValue ? just(f.apply(value)) : empty();
    }

    public Mono<T> filter(Predicate<? super T> p) {
        return hasValue && p.test(value) ? this : empty();
    }

    public <R> Mono<R> flatMap(Function<? super T, ? extends Mono<? extends R>> f) {
        if (!hasValue) return empty();
        @SuppressWarnings("unchecked")
        Mono<R> r = (Mono<R>) f.apply(value);
        return r;
    }

    public <R> Flux<R> flatMapMany(Function<? super T, ? extends Publisher<? extends R>> f) {
        if (!hasValue) return Flux.empty();
        return new Flux<>(Flux.drain(f.apply(value)));
    }

    public Mono<T> subscribeOn(reactor.core.scheduler.Scheduler scheduler) {
        return this;
    }

    public T block() {
        return hasValue ? value : null;
    }

    public CompletableFuture<T> toFuture() {
        return CompletableFuture.completedFuture(hasValue ? value : null);
    }

    public Flux<T> flux() {
        return hasValue ? Flux.just(value) : Flux.empty();
    }

    @Override
    public void subscribe(Subscriber<? super T> s) {
        s.onSubscribe(new Subscription() {
            public void request(long n) { }
            public void cancel() { }
        });
        if (hasValue) s.onNext(value);
        s.onComplete();
    }
}
