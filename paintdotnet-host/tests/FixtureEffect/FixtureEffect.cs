// Test fixture: a minimal property-based effect (channel gain + invert)
// used by tests/test_pdn_host.py to prove the host loads a plugin DLL,
// describes its properties, and renders through it.

using PaintDotNet;
using PaintDotNet.Effects;
using PaintDotNet.PropertySystem;

namespace PaintFe.Fixture;

public sealed class GainInvertEffect : PropertyBasedEffect
{
    public override string Name => "Gain + Invert";
    public override string? SubmenuName => "PaintFE Fixture";

    public override PropertyCollection OnCreatePropertyCollection() =>
        new(new Property[]
        {
            new Int32Property("Gain", 1, 0, 8),
            new BooleanProperty("Invert", false),
        });

    public override void OnRender(Surface dst, Surface src,
                                  PropertyBasedEffectConfigToken token)
    {
        int gain = token.GetPropertyValue<int>("Gain");
        bool invert = token.GetPropertyValue<bool>("Invert");
        for (int y = 0; y < src.Height; y++)
        {
            for (int x = 0; x < src.Width; x++)
            {
                var p = src[x, y];
                byte Apply(byte v)
                {
                    int r = Math.Clamp(v * gain, 0, 255);
                    return (byte)(invert ? 255 - r : r);
                }
                dst[x, y] = ColorBgra.FromBgra(
                    Apply(p.B), Apply(p.G), Apply(p.R), p.A);
            }
        }
    }
}
