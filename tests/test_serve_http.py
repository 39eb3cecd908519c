"""HTTP serving frontend tests: handler threads submit, engine thread steps."""

import json
import http.client
import threading
from http.server import ThreadingHTTPServer

import pytest

from lia_tpu.config import GenerationConfig
from lia_tpu.engine.serving import ContinuousBatcher
from lia_tpu.models.registry import get_config
from lia_tpu.utils.checkpoint import init_dummy_params


@pytest.fixture(scope="module")
def server():
    from serve import ServingFrontend, make_handler

    cfg = get_config("opt-tiny").replace(dtype="float32")
    params = init_dummy_params(cfg, seed=21, scale=0.12)
    gen = GenerationConfig(max_new_tokens=6)
    batcher = ContinuousBatcher(
        cfg, params, max_batch=2, max_len=128, gen=gen, paged=True, block_size=8
    )
    frontend = ServingFrontend(batcher)
    frontend.start()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(frontend))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield cfg, params, gen, srv.server_address[1]
    srv.shutdown()
    frontend.stop()


def _post(port, path, obj):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("POST", path, json.dumps(obj), {"Content-Type": "application/json"})
    r = conn.getresponse()
    return r.status, json.loads(r.read())


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", path)
    r = conn.getresponse()
    return r.status, json.loads(r.read())


def test_http_generate_matches_direct(server):
    cfg, params, gen, port = server
    prompts = [[5, 9, 23, 41], [100, 7, 3]]
    direct = ContinuousBatcher(cfg, params, max_batch=2, max_len=128, gen=gen)
    ids = [direct.submit(p) for p in prompts]
    ref = {i: r.output for i, r in zip(ids, sorted(direct.run(), key=lambda r: r.req_id))}

    results = {}

    def call(i, p):
        status, out = _post(port, "/generate", {"prompt_ids": p})
        results[i] = (status, out)

    threads = [threading.Thread(target=call, args=(i, p)) for i, p in enumerate(prompts)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i, (status, out) in results.items():
        assert status == 200
        assert out["output_ids"] == ref[ids[i]], f"prompt {i} over HTTP"
        assert out["ttft_s"] > 0 and out["latency_s"] > 0


def test_http_stats_health_and_errors(server):
    _, _, _, port = server
    status, health = _get(port, "/health")
    assert status == 200 and health["status"] == "ok"
    status, stats = _get(port, "/stats")
    assert status == 200 and stats["requests"] >= 2.0
    assert "prefix_hits" in stats  # paged engine exposes APC counters
    status, err = _post(port, "/generate", {"prompt": "no tokenizer configured"})
    assert status == 400 and "tokenizer" in err["error"]
    status, err = _post(port, "/generate", {"prompt_ids": [1, 2], "repetition_penalty": 1.3})
    assert status == 400  # processors not enabled on this engine
