import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.nio.charset.StandardCharsets;

/**
 * Differential probe for java17_double_repr: one 64-bit double bit
 * pattern per stdin line (unsigned hex), one Double.toString line out.
 * The SAME JVM runs the reference and Spark, so its FloatingDecimal
 * output IS the semantics the engine must match.
 */
public class DoubleProbe {
    public static void main(String[] args) throws Exception {
        BufferedReader in = new BufferedReader(
            new InputStreamReader(System.in, StandardCharsets.UTF_8));
        StringBuilder out = new StringBuilder();
        String line;
        while ((line = in.readLine()) != null) {
            if (line.isEmpty()) continue;
            long bits = Long.parseUnsignedLong(line.trim(), 16);
            out.append(Double.toString(Double.longBitsToDouble(bits)))
               .append('\n');
        }
        System.out.print(out);
    }
}
