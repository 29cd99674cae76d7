"""Serving daemon + prefetch loader (paintfe_tpu/server.py, parallel/prefetch.py)."""

import json
import threading

import numpy as np
import pytest

from paintfe_tpu import server as srv
from paintfe_tpu.core import fixtures
from paintfe_tpu.io import codecs


@pytest.fixture
def running_server():
    s, port = srv.serve_tcp(port=0)
    t = threading.Thread(target=s.serve_forever, daemon=True)
    t.start()
    yield port
    s.shutdown()
    s.server_close()


def test_server_processes_jobs_and_stays_warm(running_server, tmp_path):
    port = running_server
    img = np.asarray(fixtures.test_gradient(16, 16))
    src = tmp_path / "in.png"
    codecs.save_image(img, src, "png")
    script = tmp_path / "fx.rhai"
    script.write_text("apply_invert();")

    r1 = srv.request(port, {"input": str(src), "output": str(tmp_path / "o1.png"),
                            "script": str(script)})
    assert r1["ok"], r1
    out = codecs.load_image(tmp_path / "o1.png")
    np.testing.assert_array_equal(out[..., 0:3], 255 - img[..., 0:3])

    # second job reuses warm caches; ping reports both
    r2 = srv.request(port, {"input": str(src), "output": str(tmp_path / "o2.png"),
                            "script": str(script)})
    assert r2["ok"]
    ping = srv.request(port, {"cmd": "ping"})
    assert ping["ok"] and ping["jobs_done"] == 2


def test_server_keep_going_on_bad_job(running_server, tmp_path):
    port = running_server
    bad = srv.request(port, {"input": str(tmp_path / "missing.png"),
                             "output": str(tmp_path / "x.png")})
    assert not bad["ok"] and "error" in bad
    # still serving afterwards
    img = np.asarray(fixtures.solid(8, 8, (1, 2, 3, 255)))
    src = tmp_path / "ok.png"
    codecs.save_image(img, src, "png")
    good = srv.request(port, {"input": str(src), "output": str(tmp_path / "y.png")})
    assert good["ok"]
    garbage = srv.request(port, {"cmd": "nonsense"})
    assert not garbage.get("shutdown")


def test_server_shutdown():
    s, port = srv.serve_tcp(port=0)
    t = threading.Thread(target=s.serve_forever, daemon=True)
    t.start()
    r = srv.request(port, {"cmd": "shutdown"})
    assert r["ok"] and r["shutdown"]
    t.join(timeout=10)
    assert not t.is_alive()
    s.server_close()


def test_prefetch_images_order_and_errors(tmp_path):
    from paintfe_tpu.parallel.prefetch import prefetch_images

    paths = []
    for i in range(6):
        p = tmp_path / f"f{i}.png"
        codecs.save_image(np.asarray(fixtures.solid(4, 4, (i * 10, 0, 0, 255))), p, "png")
        paths.append(p)
    paths.insert(3, tmp_path / "missing.png")  # error slot
    results = list(prefetch_images(paths, depth=2, workers=2))
    assert [p for p, _ in results] == paths
    for i, (p, img) in enumerate(results):
        if i == 3:
            assert isinstance(img, Exception)
        else:
            assert isinstance(img, np.ndarray) and img.shape == (4, 4, 4)


def test_double_buffer_runs_in_order():
    from paintfe_tpu.parallel.prefetch import DoubleBuffer

    out = list(DoubleBuffer(lambda i: i * i, 5))
    assert out == [0, 1, 4, 9, 16]
