"""Print hand-off, single-instance IPC, keybindings, device cache."""

import numpy as np

from paintfe_tpu.core import fixtures
from paintfe_tpu.core.canvas import Canvas, Layer
from paintfe_tpu.core.device import DeviceLayerCache, composite_device
from paintfe_tpu.utils.runtime_services import (
    DEFAULT_KEYBINDINGS,
    Keybindings,
    SingleInstance,
    print_image,
)


def test_print_saves_composite(tmp_path):
    opened = []
    path = print_image(fixtures.test_gradient(16, 16), opener=opened.append)
    assert opened == [path]
    assert path.exists()
    from paintfe_tpu.io import codecs

    np.testing.assert_array_equal(codecs.load_image(path), fixtures.test_gradient(16, 16))


def test_single_instance_forwarding(tmp_path):
    sock = str(tmp_path / "si.sock")
    primary = SingleInstance(sock)
    assert primary.try_acquire()
    secondary = SingleInstance(sock)
    assert not secondary.try_acquire()
    assert secondary.forward_files(["/a.png", "/b.png"])
    import time

    deadline = time.time() + 5
    while len(primary.received) < 2 and time.time() < deadline:
        time.sleep(0.05)
    assert primary.received == ["/a.png", "/b.png"]
    primary.release()
    secondary.release()


def test_keybindings_roundtrip(tmp_path):
    kb = Keybindings()
    assert kb.action_for("ctrl+z") == "edit.undo"
    kb.rebind("edit.undo", "Ctrl+Alt+Z")
    p = tmp_path / "keys.json"
    kb.save(p)
    loaded = Keybindings.load(p)
    assert loaded.bindings["edit.undo"] == "Ctrl+Alt+Z"
    assert loaded.bindings["file.save"] == DEFAULT_KEYBINDINGS["file.save"]
    assert Keybindings.load(tmp_path / "missing.json").bindings == DEFAULT_KEYBINDINGS


def test_device_cache_avoids_reupload():
    c = Canvas.from_image(fixtures.test_gradient(32, 32))
    cache = DeviceLayerCache()
    a = cache.get(c.layers[0])
    b = cache.get(c.layers[0])
    assert a is b  # cached, same buffer object
    c.layers[0].pixels = c.layers[0].pixels.copy()  # replaced -> re-upload
    d = cache.get(c.layers[0])
    assert d is not a
    assert cache.resident_count() == 1
    assert cache.memory_bytes() == 32 * 32 * 4


def test_device_cache_evicts_dead_layers():
    """Entries for garbage-collected layers must disappear (a recycled id()
    could otherwise return a dead layer's buffer, and dead entries would
    pin HBM forever — round-4 review finding)."""
    import gc

    c = Canvas.from_image(fixtures.test_gradient(16, 16))
    cache = DeviceLayerCache()
    cache.get(c.layers[0])
    assert cache.resident_count() == 1
    c.layers.clear()
    gc.collect()
    assert cache.resident_count() == 0
    assert cache.memory_bytes() == 0


def test_device_cache_pins_host_array():
    """The cache holds the uploaded host array, so identity revalidation
    can never be fooled by id() recycling of a freed pixels array."""
    c = Canvas.from_image(fixtures.test_gradient(16, 16))
    cache = DeviceLayerCache()
    dev = cache.get(c.layers[0])
    old = c.layers[0].pixels
    c.layers[0].pixels = old + 1  # replace: identity check must miss
    dev2 = cache.get(c.layers[0])
    assert dev2 is not dev
    np.testing.assert_array_equal(np.asarray(dev2), c.layers[0].pixels)


def test_composite_device_matches_host():
    c = Canvas.from_image(fixtures.test_checkerboard(64, 64))
    top = Layer(name="fg", pixels=fixtures.blend_test_foreground(64, 64))
    from paintfe_tpu.core.blend import BlendMode

    top.blend_mode = BlendMode.OVERLAY
    c.layers.append(top)
    cache = DeviceLayerCache()
    dev = composite_device(c, cache)
    np.testing.assert_array_equal(np.asarray(dev), c.composite())


def test_single_instance_large_forward(tmp_path):
    """Forwarded path batches larger than one recv() buffer must arrive
    complete (the server drains to EOF; one recv(65536) truncated them)."""
    import time

    from paintfe_tpu.utils.runtime_services import SingleInstance

    sock = str(tmp_path / "one.sock")
    primary = SingleInstance(sock)
    assert primary.try_acquire()
    try:
        paths = [f"/very/long/path/number/{i:06d}.png" for i in range(3000)]
        secondary = SingleInstance(sock)
        assert not secondary.try_acquire()
        assert secondary.forward_files(paths)
        deadline = time.time() + 10
        while len(primary.received) < len(paths) and time.time() < deadline:
            time.sleep(0.05)
        assert primary.received == paths
    finally:
        primary.release()
