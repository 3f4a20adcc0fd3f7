import io.github.georgeakulov.json_schema.Schema;
import io.github.georgeakulov.json_schema.SchemaBuilder;

import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.nio.charset.StandardCharsets;
import java.util.Base64;
import java.util.HashMap;

/**
 * Differential probe driving the ACTUAL reference implementation
 * (compiled from /root/reference with a synchronous reactor stub).
 *
 * Protocol: one case per stdin line, TAB-separated fields:
 *   base64(schema-json) TAB base64(instance-json) TAB dialect TAB fmt
 *   [TAB taa]
 * dialect in {draft7, 2019-09, 2020-12}; fmt = 1 forces format
 * assertions; taa = 1 enables setTryCastToArray. One verdict char per output line:
 *   t/f  validation verdict
 *   c    schema compile error
 *   e    validation threw
 */
public class RefProbe {
    public static void main(String[] args) throws Exception {
        Base64.Decoder b64 = Base64.getDecoder();
        BufferedReader in = new BufferedReader(
            new InputStreamReader(System.in, StandardCharsets.UTF_8));
        StringBuilder out = new StringBuilder();
        HashMap<String, Schema> cache = new HashMap<>();
        HashMap<String, String> failed = new HashMap<>();
        String line;
        while ((line = in.readLine()) != null) {
            if (line.isEmpty()) continue;
            String[] f = line.split("\t");
            String schemaJson = new String(b64.decode(f[0]), StandardCharsets.UTF_8);
            String instance = new String(b64.decode(f[1]), StandardCharsets.UTF_8);
            String dialect = f.length > 2 ? f[2] : "2020-12";
            boolean fmt = f.length > 3 && f[3].equals("1");
            boolean taa = f.length > 4 && f[4].equals("1");
            String key = dialect + "|" + fmt + "|" + taa + "|" + schemaJson;
            if (failed.containsKey(key)) {
                out.append(failed.get(key)).append('\n');
                continue;
            }
            Schema schema = cache.get(key);
            if (schema == null) {
                try {
                    SchemaBuilder b = SchemaBuilder.create();
                    switch (dialect) {
                        case "draft7":
                            b.setDefaultDialect("http://json-schema.org/draft-07/schema#");
                            break;
                        case "2019-09":
                            b.setDefaultDialect("https://json-schema.org/draft/2019-09/schema");
                            break;
                        default:
                            b.setDefaultDialect("https://json-schema.org/draft/2020-12/schema");
                    }
                    if (fmt) b.setFormatAssertionsEnabled(true);
                    if (taa) b.setTryCastToArray(true);
                    schema = b.compile(schemaJson);
                    cache.put(key, schema);
                } catch (Throwable t) {
                    failed.put(key, "c");
                    out.append("c\n");
                    continue;
                }
            }
            try {
                var result = schema.apply(instance);
                if (result.isOk()) {
                    out.append("t\n");
                } else {
                    // verdict plus the sorted unique KIND@b64(pointer)
                    // pairs (errorType read reflectively: ValidationError
                    // keeps the enum private; pointer = the error's
                    // instance JsonPointer) for the kind + instance-
                    // pointer differentials
                    Base64.Encoder enc = Base64.getEncoder();
                    java.util.TreeSet<String> kinds = new java.util.TreeSet<>();
                    result.asStream()
                        .filter(r -> r.getType()
                            == io.github.georgeakulov.json_schema.results.IValidationResult.Type.ERROR)
                        .forEach(r -> {
                            String kind;
                            try {
                                var fld = r.getClass().getDeclaredField("errorType");
                                fld.setAccessible(true);
                                kind = String.valueOf(fld.get(r));
                            } catch (Exception ignore) {
                                kind = "?";
                            }
                            String ptr = "?";
                            try {
                                ptr = String.valueOf(r.getId().getInstanceRef());
                            } catch (Exception ignore) {
                            }
                            // rendered getError() text for the message
                            // differential (third @-field; parsers that
                            // only want (kind, ptr) ignore it)
                            String msg = "?";
                            try {
                                msg = ((io.github.georgeakulov.json_schema
                                    .results.IValidationResult
                                    .IValidationResultError) r).getError();
                            } catch (Exception ignore) {
                            }
                            kinds.add(kind + "@" + enc.encodeToString(
                                ptr.getBytes(StandardCharsets.UTF_8))
                                + "@" + enc.encodeToString(
                                msg.getBytes(StandardCharsets.UTF_8)));
                        });
                    out.append("f:").append(String.join(",", kinds)).append('\n');
                }
            } catch (Throwable t) {
                out.append("e\n");
            }
        }
        System.out.print(out);
    }
}
