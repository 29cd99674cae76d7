"""Aux services: i18n, logger, settings, autosave, profiling."""

import json
import pathlib

import numpy as np

from paintfe_tpu.core import fixtures
from paintfe_tpu.core.canvas import Canvas
from paintfe_tpu.io import pfe
from paintfe_tpu.utils import i18n, logger, profiling
from paintfe_tpu.utils.autosave import Autosaver
from paintfe_tpu.utils.settings import AppSettings


def test_i18n_lookup_and_fallback():
    i18n.init()
    i18n.set_language("en")
    assert i18n.t("interpolation.bilinear") == "Bilinear"
    i18n.set_language("fr")
    assert i18n.t("interpolation.bilinear") == "Bilinéaire"
    # key missing in the active language -> falls back to en (all shipped
    # locales are complete, so fallback is exercised via a partial one)
    i18n._state["translations"]["xx"] = {"interpolation.bilinear": "Xx"}
    i18n.set_language("xx")
    assert i18n.t("interpolation.bilinear") == "Xx"
    assert i18n.t("quality.instant") == "Instant"
    # unknown key -> key itself
    assert i18n.t("no.such.key") == "no.such.key"
    del i18n._state["translations"]["xx"]
    i18n.set_language("en")


def test_i18n_parse():
    table = i18n.parse_translations("# comment\na.b=Hello\n\nc.d=World=X\n")
    assert table == {"a.b": "Hello", "c.d": "World=X"}


def test_logger_truncates_per_session(tmp_path):
    p = tmp_path / "s.log"
    logger.init(p)
    logger.log_info("first session")
    assert "first session" in p.read_text()
    logger.init(p)  # relaunch truncates
    logger.log_warn("second")
    text = p.read_text()
    assert "first session" not in text and "second" in text
    assert "[WARN]" in text


def test_settings_roundtrip_and_defaults(tmp_path):
    p = tmp_path / "settings.json"
    s = AppSettings()
    s.jpeg_quality = 75
    s.language = "fr"
    s.save(p)
    loaded = AppSettings.load(p)
    assert loaded.jpeg_quality == 75 and loaded.language == "fr"
    # forward compat: unknown fields ignored, missing fields default
    p.write_text(json.dumps({"jpeg_quality": 42, "未知": True}))
    loaded = AppSettings.load(p)
    assert loaded.jpeg_quality == 42
    assert loaded.webp_lossless is True  # default preserved


def test_settings_load_missing_file(tmp_path):
    s = AppSettings.load(tmp_path / "nope.json")
    assert s.autosave_interval_minutes == 5


def test_autosave_roundtrip(tmp_path):
    c = Canvas.from_image(fixtures.test_gradient(32, 32))
    saver = Autosaver(interval_minutes=5.0, directory=tmp_path)
    path = saver.save_now(c, "proj")
    assert path is not None and path.exists()
    back = pfe.load_pfe(str(path))
    np.testing.assert_array_equal(back.layers[0].pixels, c.layers[0].pixels)
    assert saver.list_autosaves() == [path]


def test_autosave_interval_semantics(tmp_path):
    """interval 0 = DISABLED (lifecycle_async.rs interval_secs > 0 guard),
    and the first maybe_save waits one full interval from construction."""
    c = Canvas.from_image(fixtures.test_gradient(8, 8))
    disabled = Autosaver(interval_minutes=0.0, directory=tmp_path)
    assert disabled.maybe_save(c, "off") is None
    fresh = Autosaver(interval_minutes=5.0, directory=tmp_path)
    assert fresh.maybe_save(c, "fresh") is None  # not at t=0
    fresh.last_save -= 301.0  # one interval elapsed
    assert fresh.maybe_save(c, "fresh") is not None


def test_autosave_sanitizes_project_name(tmp_path):
    """Non-[alnum-_] chars map to '_' (lifecycle_async.rs:90-100):
    'my/project' must not create or escape directories."""
    c = Canvas.from_image(fixtures.test_gradient(8, 8))
    saver = Autosaver(interval_minutes=5.0, directory=tmp_path)
    path = saver.save_now(c, "my/evil..name!")
    assert path.parent == tmp_path
    assert path.name == "my_evil__name_.autosave.pfe"


def test_stage_timer():
    t = profiling.StageTimer()
    with t.stage("load"):
        pass
    with t.stage("process"):
        pass
    totals = t.totals()
    assert set(totals) == {"load", "process"}
    assert "load" in t.report()


def test_fps_ring():
    ring = profiling.FpsRing(size=4)
    for _ in range(6):
        ring.tick()
    assert len(ring.samples) == 4
    assert ring.fps() > 0


def test_i18n_all_locales_complete():
    """All 15 languages ship, with identical key sets (reference roster,
    src/i18n.rs:20-36; key contract from locales/en.txt)."""
    import pathlib

    locales_dir = pathlib.Path(i18n.__file__).resolve().parent.parent / "locales"
    codes = [code for code, _ in i18n.LANGUAGES]
    assert len(codes) == 15
    assert set(codes) == {
        "en", "es", "fr", "de", "pt", "it", "ja", "zh-CN", "zh-TW",
        "ru", "nl", "pl", "tr", "be", "fe",
    }
    key_sets = {}
    for code in codes:
        path = locales_dir / f"{code}.txt"
        assert path.exists(), f"missing locale file {code}.txt"
        key_sets[code] = set(i18n.parse_translations(path.read_text()))
    en_keys = key_sets["en"]
    assert len(en_keys) > 600
    for code, keys in key_sets.items():
        assert keys == en_keys, f"{code} key set diverges from en"
    # no fallback needed for a fully-translated language
    i18n.init()
    i18n.set_language("ru")
    assert i18n.t("menu.file.save_as") != "menu.file.save_as"
    i18n.set_language("fe")
    assert i18n.t("tool.magic_wand") == "The Enchanted Wand"
    i18n.set_language("en")


def test_stage_timer_blocks_on_handle_result():
    import jax.numpy as jnp

    t = profiling.StageTimer()
    with t.stage("compute") as h:
        h.result = jnp.ones((8, 8)) * 2.0  # blocked on at stage exit
    assert "compute" in t.totals()


def test_settings_load_rejects_mistyped_fields(tmp_path):
    """Hand-edited JSON with wrong types keeps the defaults (the reference's
    serde load-with-defaults), instead of exploding far from the load site."""
    import json as _json

    from paintfe_tpu.utils.settings import AppSettings

    p = tmp_path / "settings.json"
    p.write_text(_json.dumps({
        "autosave_interval_minutes": "5",     # string into numeric: rejected
        "recent_files": "a.png",              # string into list: rejected
        "theme": 3,                            # int into str: rejected
    }))
    s = AppSettings.load(p)
    d = AppSettings()
    assert s.autosave_interval_minutes == d.autosave_interval_minutes
    assert s.recent_files == d.recent_files
    assert s.theme == d.theme


def test_i18n_value_trimmed():
    from paintfe_tpu.utils.i18n import parse_translations

    out = parse_translations("menu.file = File\nmenu.edit=Edit  \n")
    assert out == {"menu.file": "File", "menu.edit": "Edit"}


def test_logger_reinit_closes_previous(tmp_path):
    from paintfe_tpu.utils import logger

    logger.init(tmp_path / "a.log")
    first = logger._file
    logger.init(tmp_path / "b.log")
    assert first.closed
    logger.write_line("x")
