"""The .NET Paint.NET plugin host (paintdotnet-host/) end to end.

Gated on the .NET SDK: this environment ships no dotnet, so the suite
skips here — on a machine with dotnet it builds the host + the fixture
effect DLL and drives describe/render through ops/plugins.PluginHost,
proving real PropertyBasedEffect DLLs run behind the trust list and the
crash-isolation boundary (reference: src/paintdotnet_plugins.rs:485-607 +
paintdotnet-host/).
"""

import pathlib
import shutil
import subprocess

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
HOST_DIR = REPO / "paintdotnet-host"

dotnet = shutil.which("dotnet")
pytestmark = pytest.mark.skipif(
    dotnet is None, reason="needs the .NET SDK (dotnet not installed)")


@pytest.fixture(scope="module")
def built_host(tmp_path_factory):
    out = tmp_path_factory.mktemp("pdnhost")
    for proj in ("src/PaintFeHost", "tests/FixtureEffect"):
        r = subprocess.run(
            [dotnet, "build", str(HOST_DIR / proj), "-c", "Release",
             "-o", str(out)],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stdout + r.stderr
    return out


def test_describe_and_render_fixture(built_host):
    from paintfe_tpu.ops.plugins import PluginHost

    host = PluginHost(built_host / "PaintFeHost.dll",
                      launcher=(dotnet,),
                      args=(built_host / "FixtureEffect.dll",))
    try:
        desc = host.describe()
        effects = desc["effects"]
        assert len(effects) == 1
        eff = effects[0]
        assert eff["name"] == "Gain + Invert"
        names = {p["name"] for p in eff["params"]}
        assert names == {"Gain", "Invert"}

        rng = np.random.default_rng(5)
        img = rng.integers(0, 128, (8, 10, 4), np.uint8)
        out = host.render(eff["id"], img, {"Gain": 2})
        np.testing.assert_array_equal(out[..., :3],
                                      np.minimum(img[..., :3] * 2, 255))
        np.testing.assert_array_equal(out[..., 3], img[..., 3])

        out = host.render(eff["id"], img, {"Gain": 1, "Invert": True})
        np.testing.assert_array_equal(out[..., :3], 255 - img[..., :3])
    finally:
        host.close()


def test_trust_list_gates_host_and_plugin(built_host, tmp_path):
    """Both the host executable AND the plugin DLL must be on the
    allowlist — the DLL is the code that actually runs (the reference
    hashes the plugin file, paintdotnet_plugins.rs:236-287)."""
    from paintfe_tpu.ops.plugins import PluginError, PluginHost, TrustList

    trust = TrustList(tmp_path / "trust.txt")
    with pytest.raises(PluginError, match="trust"):
        PluginHost(built_host / "PaintFeHost.dll", trust=trust,
                   launcher=(dotnet,),
                   args=(built_host / "FixtureEffect.dll",))
    trust.trust(built_host / "PaintFeHost.dll")
    # host trusted, plugin DLL still untrusted: must refuse
    with pytest.raises(PluginError, match="trust"):
        PluginHost(built_host / "PaintFeHost.dll", trust=trust,
                   launcher=(dotnet,),
                   args=(built_host / "FixtureEffect.dll",))
    trust.trust(built_host / "FixtureEffect.dll")
    host = PluginHost(built_host / "PaintFeHost.dll", trust=trust,
                      launcher=(dotnet,),
                      args=(built_host / "FixtureEffect.dll",))
    try:
        assert host.describe()["effects"]
    finally:
        host.close()
