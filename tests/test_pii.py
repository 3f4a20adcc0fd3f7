"""PII detect/redact operator — hand cases pinning the match shapes;
the driver oracle (``pii_scrub_documents``) pins full-byte Java/RE2
agreement on the generated corpus."""

from pyspark.sql import functions as F

from json_schema_spark.operators.pii import detect_pii, redact_pii


def _scrub(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    red = redact_pii(df).collect()[0].redacted
    det = detect_pii(df).collect()[0]
    return red, det


def test_email(spark):
    red, det = _scrub(spark, "mail me at jo.doe+spam@sub.example.co.uk now")
    assert red == "mail me at [PII:email] now"
    assert det.pii_email == 1 and det.pii_total == 1


def test_credit_card_beats_phone(spark):
    red, det = _scrub(spark, "card 4111 1111 1111 1111 ok")
    assert red == "card [PII:credit_card] ok"
    assert det.pii_credit_card == 1 and det.pii_phone == 0


def test_ssn_and_phone(spark):
    red, det = _scrub(spark, "ssn 078-05-1120 call +44 20 7946 0958")
    assert "[PII:ssn]" in red and "[PII:phone]" in red
    assert det.pii_ssn == 1 and det.pii_phone == 1


def test_ipv4_octet_bounds(spark):
    red, det = _scrub(spark, "from 10.255.0.1 not 999.999.999.999")
    assert "[PII:ipv4]" in red
    assert det.pii_ipv4 >= 1
    # 999... is not a valid quad, but its 99.999... tail contains a
    # valid-shaped one — aggressive redaction is the documented intent
    assert "10.255.0.1" not in red


def test_clean_text_untouched(spark):
    red, det = _scrub(spark, "nothing personal here, just 42 words")
    assert red == "nothing personal here, just 42 words"
    assert det.pii_total == 0


def test_null_text(spark):
    red, det = _scrub(spark, None)
    assert red == "" and det.pii_total == 0


def test_plan_is_single_codegen_projection(spark):
    # the 100 TB property: scrubbing is one narrow projection — no
    # shuffle, no Python, nothing but the scan and a Project
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    plan = redact_pii(detect_pii(df))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
