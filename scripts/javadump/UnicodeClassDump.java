import java.lang.Character.UnicodeBlock;
import java.lang.Character.UnicodeScript;
import java.lang.reflect.Field;
import java.lang.reflect.Modifier;
import java.util.LinkedHashMap;
import java.util.Map;
import java.util.TreeMap;
import java.util.regex.Pattern;

/**
 * Dumps the exact codepoint sets behind java.util.regex \p{...} classes
 * (compiled with UNICODE_CASE | UNICODE_CHARACTER_CLASS -- the dialect the
 * reference uses, common/regex/RegexFactory.java:20, and the dialect
 * Spark's rlike evaluates) so the Python kernel can translate \p classes
 * with JVM-exact semantics instead of rejecting them.
 *
 * Run: java --add-opens java.base/java.lang=ALL-UNNAMED UnicodeClassDump
 * Output (stdout, TSV):
 *   R <key> <hexstart-hexend,...>   one canonical class
 *   A <aliaskey> <canonicalkey>     an accepted alias spelling
 * Key namespaces mirror Pattern's name resolution tiers:
 *   gc: exact-case general categories; posix: UPPER (case-insensitive
 *   under UCC); bin: UPPER binary property names incl. Java's alias
 *   spellings; sc: UPPER script enum names + ISO alias map;
 *   blk: UPPER block names (field, spaced, and squashed forms);
 *   java: exact-case Character.isXxx method classes.
 */
public class UnicodeClassDump {
    static final int FLAGS = Pattern.UNICODE_CASE | Pattern.UNICODE_CHARACTER_CLASS;
    static final int MAX = 0x10FFFF;

    static String ranges(boolean[] in) {
        StringBuilder sb = new StringBuilder();
        int start = -1;
        for (int cp = 0; cp <= MAX; cp++) {
            if (in[cp] && start < 0) start = cp;
            else if (!in[cp] && start >= 0) {
                if (sb.length() > 0) sb.append(',');
                sb.append(Integer.toHexString(start)).append('-')
                  .append(Integer.toHexString(cp - 1));
                start = -1;
            }
        }
        if (start >= 0) {
            if (sb.length() > 0) sb.append(',');
            sb.append(Integer.toHexString(start)).append('-')
              .append(Integer.toHexString(MAX));
        }
        return sb.toString();
    }

    static void dumpPattern(String key, String patName, StringBuilder out) {
        Pattern p;
        try { p = Pattern.compile("\\p{" + patName + "}", FLAGS); }
        catch (Exception e) { return; }  // not supported by this JVM: skip
        boolean[] in = new boolean[MAX + 1];
        var m = p.matcher("");
        for (int cp = 0; cp <= MAX; cp++)
            in[cp] = m.reset(new String(Character.toChars(cp))).matches();
        out.append("R\t").append(key).append('\t').append(ranges(in)).append('\n');
    }

    public static void main(String[] args) throws Exception {
        StringBuilder out = new StringBuilder();

        // -------- general categories (exact case, Pattern's gc tier)
        String[] cats = {"Cn","Lu","Ll","Lt","Lm","Lo","Mn","Me","Mc","Nd",
            "Nl","No","Zs","Zl","Zp","Cc","Cf","Co","Cs","Pd","Ps","Pe","Pc",
            "Po","Sm","Sc","Sk","So","Pi","Pf","L","M","N","Z","C","P","S",
            "LC","LD","L1","all"};
        for (String c : cats) dumpPattern("gc:" + c, c, out);

        // -------- POSIX classes (case-insensitive under UCC)
        String[] posix = {"Lower","Upper","ASCII","Alpha","Digit","Alnum",
            "Punct","Graph","Print","Blank","Cntrl","XDigit","Space"};
        for (String p : posix) dumpPattern("posix:" + p.toUpperCase(), p, out);

        // -------- binary properties (\p{IsX}; names + Java's alias spellings)
        String[] props = {"ALPHABETIC","LETTER","IDEOGRAPHIC","LOWERCASE",
            "UPPERCASE","TITLECASE","WHITE_SPACE","CONTROL","PUNCTUATION",
            "HEX_DIGIT","ASSIGNED","NONCHARACTER_CODE_POINT","DIGIT","ALNUM",
            "BLANK","GRAPH","PRINT","WORD","JOIN_CONTROL"};
        for (String p : props) dumpPattern("bin:" + p, "Is" + p, out);
        String[][] propAliases = {{"WHITESPACE","WHITE_SPACE"},
            {"HEXDIGIT","HEX_DIGIT"},{"NONCHARACTERCODEPOINT","NONCHARACTER_CODE_POINT"},
            {"JOINCONTROL","JOIN_CONTROL"}};
        for (String[] a : propAliases)
            out.append("A\tbin:").append(a[0]).append("\tbin:").append(a[1]).append('\n');

        // -------- java.lang.Character.isXxx classes (exact case)
        String[] javas = {"javaLowerCase","javaUpperCase","javaAlphabetic",
            "javaIdeographic","javaTitleCase","javaDigit","javaDefined",
            "javaLetter","javaLetterOrDigit","javaJavaIdentifierStart",
            "javaJavaIdentifierPart","javaUnicodeIdentifierStart",
            "javaUnicodeIdentifierPart","javaIdentifierIgnorable",
            "javaSpaceChar","javaWhitespace","javaISOControl","javaMirrored"};
        for (String j : javas) dumpPattern("java:" + j, j, out);

        // -------- scripts: Pattern delegates to UnicodeScript.of -- one pass
        Map<UnicodeScript, boolean[]> scr = new LinkedHashMap<>();
        for (UnicodeScript s : UnicodeScript.values()) scr.put(s, new boolean[MAX + 1]);
        for (int cp = 0; cp <= MAX; cp++) {
            if (!Character.isValidCodePoint(cp)) continue;
            scr.get(UnicodeScript.of(cp))[cp] = true;
        }
        for (Map.Entry<UnicodeScript, boolean[]> e : scr.entrySet())
            out.append("R\tsc:").append(e.getKey().name()).append('\t')
               .append(ranges(e.getValue())).append('\n');
        Field af = UnicodeScript.class.getDeclaredField("aliases");
        af.setAccessible(true);
        @SuppressWarnings("unchecked")
        Map<String, UnicodeScript> aliases = (Map<String, UnicodeScript>) af.get(null);
        for (Map.Entry<String, UnicodeScript> e : new TreeMap<>(aliases).entrySet())
            out.append("A\tsc:").append(e.getKey().toUpperCase())
               .append("\tsc:").append(e.getValue().name()).append('\n');

        // -------- blocks: Pattern delegates to UnicodeBlock.forName/of
        Map<String, UnicodeBlock> blocks = new TreeMap<>();
        for (Field f : UnicodeBlock.class.getFields())
            if (Modifier.isStatic(f.getModifiers()) && f.getType() == UnicodeBlock.class)
                blocks.put(f.getName(), (UnicodeBlock) f.get(null));
        Map<UnicodeBlock, boolean[]> blk = new LinkedHashMap<>();
        for (UnicodeBlock b : blocks.values()) blk.putIfAbsent(b, new boolean[MAX + 1]);
        for (int cp = 0; cp <= MAX; cp++) {
            UnicodeBlock b = UnicodeBlock.of(cp);
            if (b != null && blk.containsKey(b)) blk.get(b)[cp] = true;
        }
        Map<UnicodeBlock, String> canon = new LinkedHashMap<>();
        for (Map.Entry<String, UnicodeBlock> e : blocks.entrySet())
            canon.putIfAbsent(e.getValue(), e.getKey());
        for (Map.Entry<UnicodeBlock, String> e : canon.entrySet())
            out.append("R\tblk:").append(e.getValue().toUpperCase()).append('\t')
               .append(ranges(blk.get(e.getKey()))).append('\n');
        for (Map.Entry<String, UnicodeBlock> e : blocks.entrySet()) {
            String c = canon.get(e.getValue()).toUpperCase();
            String n = e.getKey().toUpperCase();
            if (!n.equals(c))
                out.append("A\tblk:").append(n).append("\tblk:").append(c).append('\n');
            String spaced = n.replace('_', ' ');
            if (!spaced.equals(c))
                out.append("A\tblk:").append(spaced).append("\tblk:").append(c).append('\n');
            String squashed = n.replace("_", "");
            if (!squashed.equals(c))
                out.append("A\tblk:").append(squashed).append("\tblk:").append(c).append('\n');
        }

        System.out.print(out);
    }
}
