"""R5 over a REAL socket: a local threaded HTTP server speaking the
Ollama /api/generate wire shape drives HttpLLMClient's actual
urllib transport end-to-end through llm_map on Spark executors —
everything the env-gated live test exercises except the model
weights themselves (responses are deterministic functions of the
prompt).
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from ai_data_pipeline_spark.operators.llm_map import HttpLLMClient, llm_map


class _OllamaStub(BaseHTTPRequestHandler):
    fail_first_for: set[str] = set()
    lock = threading.Lock()

    def do_POST(self):  # noqa: N802 — BaseHTTPRequestHandler API
        n = int(self.headers["Content-Length"])
        req = json.loads(self.rfile.read(n))
        prompt = req["prompt"]
        # deterministic "model": echo a QA json derived from the prompt
        tag = prompt.strip().split()[-1] if prompt.strip() else ""
        with self.lock:
            flaky = tag in self.fail_first_for
            if flaky:
                self.fail_first_for.discard(tag)
        if flaky:
            self.send_response(500)
            self.end_headers()
            return
        body = json.dumps(
            {
                "model": req["model"],
                "response": json.dumps({"question": f"Q about {tag}?", "answer": f"A:{tag}"}),
                "done": True,
            }
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence request logging
        pass


@pytest.fixture(scope="module")
def llm_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _OllamaStub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/api/generate"
    srv.shutdown()


def test_http_client_real_socket(llm_server):
    c = HttpLLMClient(llm_server, "stub-model", timeout=10.0)
    out = c.generate(["chunk alpha", "chunk beta"])
    assert json.loads(out[0]) == {"question": "Q about alpha?", "answer": "A:alpha"}
    assert json.loads(out[1])["answer"] == "A:beta"


def test_http_client_retry_over_socket(llm_server):
    """A 500 on the first attempt is retried through the REAL
    transport and succeeds on the second."""
    _OllamaStub.fail_first_for = {"gamma"}
    c = HttpLLMClient(llm_server, "stub-model", timeout=10.0, backoff_s=0.0)
    assert json.loads(c.generate(["chunk gamma"])[0])["answer"] == "A:gamma"


def test_llm_map_end_to_end_over_http(spark, llm_server):
    """llm_map on executors → HTTP → wire JSON → raw_response column;
    composes with the R6 JSON fallback downstream."""
    from ai_data_pipeline_spark.operators.json_fallback import validate_qa

    df = spark.createDataFrame(
        [(i, f"body of chunk c{i}") for i in range(8)],
        "chunk_id long, chunk_text string",
    )
    out = llm_map(df, lambda: HttpLLMClient(llm_server, "stub-model", timeout=10.0))
    rows = validate_qa(out, "raw_response").orderBy("chunk_id").collect()
    assert len(rows) == 8
    assert all(r["is_valid"] for r in rows)
    assert rows[3]["qa"]["answer"] == "A:c3"
