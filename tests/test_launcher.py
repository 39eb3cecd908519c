"""Multi-instance launcher tests (ipexrun --ninstances analog): device
slicing, command templating, replica supervision, round-robin proxy."""

import json
import subprocess
import sys
import threading
import urllib.request

from lia_tpu.utils.launcher import (
    ReplicaSet, build_commands, device_slices, make_proxy,
)


def test_device_slices_partition():
    assert device_slices(2, 8) == ["0,1,2,3", "4,5,6,7"]
    assert device_slices(3, 8) == ["0,1", "2,3", "4,5"]  # remainder unused
    assert device_slices(4, 2) == ["0", "1", "0", "1"]  # round-robin (CPU test rigs)
    assert device_slices(2, 0) == ["", ""]


def test_build_commands_templating_and_default_port():
    cmds = build_commands(["x", "--port", "{port}", "--id", "{instance}"], 2, 9000)
    assert cmds == [["x", "--port", "9000", "--id", "0"],
                    ["x", "--port", "9001", "--id", "1"]]
    # no {port} placeholder -> --port base+i appended
    cmds = build_commands(["x"], 2, 9000)
    assert cmds == [["x", "--port", "9000"], ["x", "--port", "9001"]]


def test_replicaset_runs_and_sets_env(tmp_path):
    out = tmp_path / "env{instance}.json"
    script = (
        "import json,os,sys; json.dump({'i': os.environ.get('LIA_INSTANCE'),"
        " 'dev': os.environ.get('JAX_VISIBLE_DEVICES')}, open(sys.argv[1], 'w'))"
    )
    cmds = [[sys.executable, "-c", script, str(tmp_path / f"env{i}.json")]
            for i in range(2)]
    rs = ReplicaSet(cmds, ["0,1", "2,3"])
    rs.start()
    assert rs.wait(timeout=30) == [0, 0]
    for i, dev in enumerate(["0,1", "2,3"]):
        got = json.load(open(tmp_path / f"env{i}.json"))
        assert got == {"i": str(i), "dev": dev}


def test_proxy_round_robins_two_backends():
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    def backend(tag):
        class H(BaseHTTPRequestHandler):
            def do_GET(self):
                self.send_response(200)
                self.end_headers()
                self.wfile.write(json.dumps({"tag": tag}).encode())
            def log_message(self, *a):
                pass
        srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv

    b1, b2 = backend("a"), backend("b")
    proxy = make_proxy(0, [b1.server_port, b2.server_port])
    threading.Thread(target=proxy.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{proxy.server_port}"
    tags = [json.load(urllib.request.urlopen(f"{url}/x", timeout=10))["tag"]
            for _ in range(4)]
    assert sorted(tags[:2]) == ["a", "b"] and tags[:2] == tags[2:]
    reps = json.load(urllib.request.urlopen(f"{url}/replicas", timeout=10))
    assert reps["ports"] == [b1.server_port, b2.server_port]
    for s in (proxy, b1, b2):
        s.shutdown()
