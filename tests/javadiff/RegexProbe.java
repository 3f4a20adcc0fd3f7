import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.nio.charset.StandardCharsets;
import java.util.regex.Pattern;

/**
 * Differential probe for the kernel's java.util.regex dialect bridge
 * (json_schema_spark/functions/formats.py::java_dialect_rewrite).
 *
 * Protocol: one case per stdin line, fields joined by a TAB:
 *   base64(pattern-utf8) TAB base64(input-utf8)
 * One verdict per stdout line: "t" (find true), "f" (find false) or
 * "e" (Pattern.compile threw). Patterns compile with
 * UNICODE_CASE | UNICODE_CHARACTER_CLASS — exactly the reference's
 * RegexFactory.java:20 — and are evaluated with find(), the
 * reference's schema-`pattern` semantics (search, not full match).
 */
public class RegexProbe {
    public static void main(String[] args) throws Exception {
        BufferedReader in = new BufferedReader(
            new InputStreamReader(System.in, StandardCharsets.UTF_8));
        StringBuilder out = new StringBuilder();
        java.util.Base64.Decoder b64 = java.util.Base64.getDecoder();
        String line;
        while ((line = in.readLine()) != null) {
            if (line.isEmpty()) continue;
            int tab = line.indexOf('\t');
            String pat = new String(b64.decode(line.substring(0, tab)), StandardCharsets.UTF_8);
            String txt = new String(b64.decode(line.substring(tab + 1)), StandardCharsets.UTF_8);
            try {
                Pattern p = Pattern.compile(
                    pat, Pattern.UNICODE_CASE | Pattern.UNICODE_CHARACTER_CLASS);
                out.append(p.matcher(txt).find() ? 't' : 'f').append('\n');
            } catch (Exception e) {
                out.append('e').append('\n');
            }
        }
        System.out.print(out);
    }
}
