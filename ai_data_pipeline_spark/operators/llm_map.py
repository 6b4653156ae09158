"""R5: the LLM enrichment map (`app/main.py:37-44,121-137`).

The reference calls an Ollama endpoint once per chunk, serially —
the slowest possible shape. Spark-first: ``mapInPandas`` with a
per-partition client so (a) requests batch within a partition, (b)
partitions run in parallel across executors, (c) the model client is
constructed once per task, not per row.

Non-deterministic by nature → excluded from the oracle set; tests
inject ``StubLLM`` (deterministic, keyed on prompt hash, exercising
every R6 fallback path).

The client is injectable (a factory returning ``generate(prompts) ->
list[str]``) so the engine never hard-depends on a serving stack.
``HttpLLMClient`` posts to an OpenAI/Ollama-style endpoint using only
stdlib urllib; construct it with explicit url/model (reference
config: deepseek-r1:7b, temperature 0.3, num_ctx 4096,
`app/main.py:121-126`).
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROMPT_TEMPLATE = (
    "Generate a question and answer pair from the following text. "
    'Respond with JSON with exactly two keys: "question" and "answer".\n\n{chunk}'
)


class StubLLM:
    """Deterministic fake: response format cycles by prompt md5 so a
    corpus exercises all R6 fallback stages (bare JSON / fenced /
    backticked / garbage)."""

    def generate(self, prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            h = hashlib.md5(p.encode("utf-8")).hexdigest()
            payload = json.dumps({"question": f"Q-{h[:8]}?", "answer": f"A-{h[8:16]}"})
            mode = int(h, 16) % 4
            if mode == 0:
                out.append(payload)
            elif mode == 1:
                out.append(f"reasoning...\n```json\n{payload}\n```\ndone")
            elif mode == 2:
                out.append(f"the answer is `{payload}` ok")
            else:
                out.append("I cannot answer that.")
        return out


def _urllib_transport(url: str, body: bytes, timeout: float) -> bytes:
    import urllib.request

    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.read()


class HttpLLMClient:
    """Minimal Ollama-style /api/generate client (stdlib only).

    Production posture for a 1000-task stage: every request carries a
    ``timeout``, transient failures retry up to ``max_retries`` times
    with DETERMINISTIC exponential backoff (no random jitter — task
    retries must be reproducible), and exhausting retries either
    raises (default — loud, lets Spark's task retry take over) or
    yields ``error_sentinel`` when ``on_error="sentinel"`` so one dead
    prompt can't poison a multi-hour batch; the R6 JSON fallback
    downstream already classifies sentinel rows as parse failures.

    ``transport`` is injectable (``(url, body, timeout) -> bytes``) so
    the retry policy is unit-testable without a live endpoint.
    """

    def __init__(
        self,
        url: str,
        model: str,
        temperature: float = 0.3,
        num_ctx: int = 4096,
        timeout: float = 120.0,
        max_retries: int = 3,
        backoff_s: float = 1.0,
        on_error: str = "raise",
        transport: Callable[[str, bytes, float], bytes] | None = None,
    ):
        if on_error not in ("raise", "sentinel"):
            raise ValueError("on_error must be 'raise' or 'sentinel'")
        self.url, self.model = url, model
        self.options = {"temperature": temperature, "num_ctx": num_ctx}
        self.timeout, self.max_retries = timeout, max_retries
        self.backoff_s, self.on_error = backoff_s, on_error
        self.transport = transport or _urllib_transport
        self.error_sentinel = ""
        self.n_errors = 0  # per-client (= per-task) failure count

    def _one(self, prompt: str) -> str:
        import time as _time

        body = json.dumps(
            {"model": self.model, "prompt": prompt, "stream": False, "options": self.options}
        ).encode("utf-8")
        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                return json.loads(self.transport(self.url, body, self.timeout)).get(
                    "response", ""
                )
            except Exception as e:  # noqa: BLE001 — transport/json errors all retry
                last = e
                if attempt < self.max_retries:
                    _time.sleep(self.backoff_s * (2**attempt))
        self.n_errors += 1
        if self.on_error == "raise":
            raise RuntimeError(
                f"LLM request failed after {self.max_retries + 1} attempts"
            ) from last
        return self.error_sentinel

    def generate(self, prompts: list[str]) -> list[str]:
        return [self._one(p) for p in prompts]


def llm_map(
    df: DataFrame,
    client_factory: Callable[[], object],
    text_col: str = "chunk_text",
    out_col: str = "raw_response",
    prompt_template: str = PROMPT_TEMPLATE,
    batch_size: int = 32,
) -> DataFrame:
    """Append ``out_col`` = LLM response per row via mapInPandas.

    One client per task; prompts submitted in ``batch_size`` groups
    so a client that supports batching can exploit it.
    """
    in_schema = df.schema
    out_schema = f"{in_schema.simpleString()[7:-1]}, {out_col} string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        for pdf in batches:
            prompts = [prompt_template.format(chunk=t) for t in pdf[text_col].fillna("")]
            responses: list[str] = []
            for i in range(0, len(prompts), batch_size):
                responses.extend(client.generate(prompts[i : i + batch_size]))
            pdf = pdf.copy()
            pdf[out_col] = responses
            yield pdf

    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(list(in_schema.fields) + [StructField(out_col, StringType())])
    return df.mapInPandas(run, schema)
