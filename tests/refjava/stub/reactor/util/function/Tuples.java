package reactor.util.function;

public final class Tuples {
    private Tuples() { }

    public static <T1, T2> Tuple2<T1, T2> of(T1 t1, T2 t2) {
        return new Tuple2<>(t1, t2);
    }
}
