"""R6 3-stage JSON fallback on the crafted cases of FIXTURES.md A3,
plus the LLM stub pipeline (R5 stubbed → R6 → R7/R8 lineage)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ai_data_pipeline_spark.operators.json_fallback import extract_json, valid_records, validate_qa
from ai_data_pipeline_spark.operators.llm_map import PROMPT_TEMPLATE, StubLLM, llm_map

GOOD = json.dumps({"question": "Q1?", "answer": "A1"})


def _parse(spark, raw: str):
    df = spark.createDataFrame([(raw,)], "raw STRING")
    return df.select(extract_json("raw").alias("qa")).collect()[0].qa


def test_stage1_bare_json(spark):
    qa = _parse(spark, GOOD)
    assert qa.question == "Q1?" and qa.answer == "A1"


def test_stage2_fenced(spark):
    qa = _parse(spark, f"thinking...\n```json\n{GOOD}\n```\ntrailing")
    assert qa.question == "Q1?"


def test_stage2_fenced_multiline_dotall(spark):
    fenced = '```json\n{"question": "multi\\nline?",\n "answer": "yes"}\n```'
    qa = _parse(spark, fenced)
    assert qa.answer == "yes"


def test_stage3_backticked(spark):
    qa = _parse(spark, f"the result is `{GOOD}` ok?")
    assert qa.answer == "A1"


def test_all_fail_null(spark):
    assert _parse(spark, "no json here at all") is None


def test_fenced_invalid_then_backtick_valid_fails_like_reference(spark):
    # FIXTURES A3(f) refined against the reference: stage 3 takes only
    # the FIRST single-backtick span (`app/main.py:56`, re.search) —
    # when an invalid fenced block precedes, that first span is the
    # empty string between the fence's own backticks, so the record
    # is dropped. Parity requires None here, not a rescue.
    raw = "```json\n{not valid}\n``` but `" + GOOD + "`"
    assert _parse(spark, raw) is None


def test_backtick_rescue_without_fence(spark):
    # the genuine stage-3 rescue: no fence anywhere, valid JSON in
    # the first single-backtick span
    raw = "no fences here, but `" + GOOD + "` trailing"
    qa = _parse(spark, raw)
    assert qa is not None and qa.question == "Q1?"


def test_wrong_keys_parse_but_invalid(spark):
    df = spark.createDataFrame([('{"foo": 1}',)], "raw STRING")
    row = validate_qa(df, "raw").collect()[0]
    assert row.qa is not None  # stage 1 parsed (reference records as-is)
    assert not row.is_valid  # engine's validity contract: both keys present


def test_stub_pipeline_end_to_end(spark):
    chunks = spark.createDataFrame(
        [(f"doc{i % 3}.pdf", 1 + i % 2, 1 + i % 4, f"chunk text {i}") for i in range(40)],
        "source_file STRING, window_index INT, subchunk_index INT, chunk_text STRING",
    )
    with_resp = llm_map(chunks, StubLLM)
    out = valid_records(with_resp)
    rows = out.collect()
    # stub yields valid JSON in 3 of 4 modes
    assert 0 < len(rows) < 40
    assert set(out.columns) == {"question", "answer", "source_file", "window_index", "subchunk_index"}
    # determinism: same input → same output
    rows2 = valid_records(llm_map(chunks, StubLLM)).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
    # stub answers match the python-side expectation for one prompt
    prompt = PROMPT_TEMPLATE.format(chunk="chunk text 0")
    expect = StubLLM().generate([prompt])[0]
    got = with_resp.filter(F.col("chunk_text") == "chunk text 0").collect()[0].raw_response
    assert got == expect


def test_valid_records_with_metrics_single_pass(spark):
    from ai_data_pipeline_spark.operators.json_fallback import valid_records_with_metrics

    df = spark.createDataFrame(
        [
            ('{"question": "q1", "answer": "a1"}', "f", 1, 1),
            ('```json {"question": "q2", "answer": "a2"} ```', "f", 1, 2),
            ("not json at all", "f", 1, 3),
            ('{"wrong": "keys"}', "f", 1, 4),
        ],
        "raw_response string, source_file string, window_index int, subchunk_index int",
    )
    records, obs = valid_records_with_metrics(df)
    rows = records.collect()  # action → metrics become available
    assert {r["question"] for r in rows} == {"q1", "q2"}
    assert obs.get == {"n_total": 4, "n_valid": 2, "n_invalid": 2}


def test_http_client_retries_transient_then_succeeds():
    """A transport that fails twice then succeeds must transparently
    retry (deterministic backoff) and return the response."""
    from ai_data_pipeline_spark.operators.llm_map import HttpLLMClient

    calls = []

    def flaky(url, body, timeout):
        calls.append(1)
        if len(calls) < 3:
            raise OSError("connection reset")
        import json as _json

        return _json.dumps({"response": "ok"}).encode()

    c = HttpLLMClient("http://x", "m", backoff_s=0.0, transport=flaky)
    assert c.generate(["p"]) == ["ok"]
    assert len(calls) == 3
    assert c.n_errors == 0


def test_http_client_exhausted_raises_by_default():
    from ai_data_pipeline_spark.operators.llm_map import HttpLLMClient

    import pytest as _pytest

    def dead(url, body, timeout):
        raise OSError("down")

    c = HttpLLMClient("http://x", "m", max_retries=1, backoff_s=0.0, transport=dead)
    with _pytest.raises(RuntimeError, match="after 2 attempts"):
        c.generate(["p"])


def test_http_client_sentinel_mode_counts_errors():
    """on_error='sentinel' yields the empty sentinel (classified as a
    parse failure by the R6 fallback) instead of failing the task."""
    from ai_data_pipeline_spark.operators.llm_map import HttpLLMClient

    def dead(url, body, timeout):
        raise OSError("down")

    c = HttpLLMClient(
        "http://x", "m", max_retries=0, backoff_s=0.0,
        on_error="sentinel", transport=dead,
    )
    assert c.generate(["a", "b"]) == ["", ""]
    assert c.n_errors == 2


# --- extract_json_python (pure-Python twin) parity ---------------------------

# String-valued / garbage / empty-object cases: the twin contract
# covers exactly what StubLLM + the reference emit (string Q/A or
# unparseable text); numeric JSON values render differently across
# the engines and are out of contract.
_PARITY_FIXTURES = [
    GOOD,
    f"thinking...\n```json\n{GOOD}\n```\ntrailing",
    '```json\n{"question": "multi\nline?",\n "answer": "yes"}\n```',
    f"the result is `{GOOD}` ok?",
    "I cannot answer that.",
    "",
    "{}",                       # parsed-but-keyless: stage 1 SUCCESS
    "```json\n{}\n```",
    "pre `{}` post",
    '```json\n{"broken": \n```',  # fenced garbage, no backtick rescue
    '`not json` and `{"question":"q2","answer":"a2"}`',  # first span wins
    '{"wrong": "keys"}',
    "[1, 2, 3]",                # valid JSON, not an object → all fail
    "`[1]`",
]


def test_empty_object_is_stage_success(spark):
    """'{}' parses at stage 1: Spark yields a non-null struct of null
    fields, the twin yields {} — NOT None (r06 ADVICE medium: the old
    truthiness chain fell through on falsy {})."""
    from ai_data_pipeline_spark.operators.json_fallback import extract_json_python

    assert extract_json_python("{}") == {}
    qa = _parse(spark, "{}")
    assert qa is not None and qa.question is None and qa.answer is None


def test_python_twin_matches_spark(spark):
    """extract_json_python == extract_json on every fixture: null ↔
    None, else field-by-field on the contract keys."""
    from ai_data_pipeline_spark.operators.json_fallback import extract_json_python

    df = spark.createDataFrame([(i, r) for i, r in enumerate(_PARITY_FIXTURES)], "i INT, raw STRING")
    got = {r.i: r.qa for r in df.select("i", extract_json("raw").alias("qa")).collect()}
    for i, raw in enumerate(_PARITY_FIXTURES):
        py = extract_json_python(raw)
        sp = got[i]
        if py is None:
            assert sp is None, f"fixture {i}: twin None, Spark {sp}"
        else:
            assert sp is not None, f"fixture {i}: Spark None, twin {py}"
            assert sp.question == py.get("question"), f"fixture {i}"
            assert sp.answer == py.get("answer"), f"fixture {i}"


def test_python_twin_matches_spark_on_stub_corpus(spark):
    """Parity over every StubLLM response mode (the exact strings the
    composed E2E row feeds through both engines)."""
    from ai_data_pipeline_spark.operators.json_fallback import extract_json_python

    prompts = [PROMPT_TEMPLATE.format(chunk=f"chunk {i} text") for i in range(40)]
    responses = StubLLM().generate(prompts)
    df = spark.createDataFrame([(i, r) for i, r in enumerate(responses)], "i INT, raw STRING")
    got = {r.i: r.qa for r in df.select("i", extract_json("raw").alias("qa")).collect()}
    n_valid = 0
    for i, raw in enumerate(responses):
        py = extract_json_python(raw)
        sp = got[i]
        if py is None:
            assert sp is None
        else:
            assert (sp.question, sp.answer) == (py.get("question"), py.get("answer"))
            n_valid += 1
    assert 0 < n_valid < len(responses)  # corpus exercises both outcomes
