package refcompat;

import java.util.ArrayList;
import java.util.Collections;
import java.util.List;

/** Java-17 stand-ins for the Java-21 SequencedCollection methods the
 *  reference uses; call sites are rewritten mechanically at build time. */
public final class Compat {
    private Compat() { }

    public static <T> List<T> reversed(List<T> list) {
        List<T> out = new ArrayList<>(list);
        Collections.reverse(out);
        return out;
    }
}
