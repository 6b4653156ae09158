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


class HttpLLMClient:
    """Minimal Ollama-style /api/generate client (stdlib only)."""

    def __init__(self, url: str, model: str, temperature: float = 0.3, num_ctx: int = 4096):
        self.url, self.model = url, model
        self.options = {"temperature": temperature, "num_ctx": num_ctx}

    def generate(self, prompts: list[str]) -> list[str]:
        import urllib.request

        outs = []
        for p in prompts:
            body = json.dumps(
                {"model": self.model, "prompt": p, "stream": False, "options": self.options}
            ).encode("utf-8")
            req = urllib.request.Request(
                self.url, data=body, headers={"Content-Type": "application/json"}
            )
            with urllib.request.urlopen(req) as resp:
                outs.append(json.loads(resp.read()).get("response", ""))
        return outs


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
