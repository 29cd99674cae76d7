// Clean-room stubs of the public Paint.NET plugin API's property-based
// effect core, so Paint.NET effect DLLs resolve their references when
// loaded into this host.  Mirrors the scope of the reference host's stub
// assemblies (PaintDotNet.Base / .Core / .Effects): enough surface for
// PropertyBasedEffect plugins — pixels, properties, render callback — not
// the whole Paint.NET application API.

using System.Collections;

namespace PaintDotNet
{
    /// 32-bit BGRA pixel, the memory layout Paint.NET surfaces use.
    public struct ColorBgra
    {
        public byte B, G, R, A;

        public static ColorBgra FromBgra(byte b, byte g, byte r, byte a) =>
            new() { B = b, G = g, R = r, A = a };

        public static ColorBgra FromArgb(byte a, byte r, byte g, byte b) =>
            new() { B = b, G = g, R = r, A = a };
    }

    /// A dense BGRA raster with (x, y) indexing.
    public sealed class Surface
    {
        public int Width { get; }
        public int Height { get; }
        private readonly ColorBgra[] _pixels;

        public Surface(int width, int height)
        {
            Width = width;
            Height = height;
            _pixels = new ColorBgra[checked(width * height)];
        }

        public ColorBgra this[int x, int y]
        {
            get => _pixels[y * Width + x];
            set => _pixels[y * Width + x] = value;
        }

        public ColorBgra GetPoint(int x, int y) => this[x, y];

        /// Import/export RGBA byte order (the host protocol's wire format).
        public static Surface FromRgbaBytes(int width, int height, byte[] rgba)
        {
            var s = new Surface(width, height);
            for (int i = 0; i < width * height; i++)
                s._pixels[i] = ColorBgra.FromBgra(
                    rgba[4 * i + 2], rgba[4 * i + 1], rgba[4 * i], rgba[4 * i + 3]);
            return s;
        }

        public byte[] ToRgbaBytes()
        {
            var outBytes = new byte[_pixels.Length * 4];
            for (int i = 0; i < _pixels.Length; i++)
            {
                outBytes[4 * i] = _pixels[i].R;
                outBytes[4 * i + 1] = _pixels[i].G;
                outBytes[4 * i + 2] = _pixels[i].B;
                outBytes[4 * i + 3] = _pixels[i].A;
            }
            return outBytes;
        }

        public void CopyFrom(Surface other)
        {
            Array.Copy(other._pixels, _pixels, _pixels.Length);
        }
    }
}

namespace PaintDotNet.PropertySystem
{
    public abstract class Property
    {
        public string Name { get; }
        public object? Value { get; set; }

        protected Property(string name, object? defaultValue)
        {
            Name = name;
            Value = defaultValue;
        }

        public abstract string TypeName { get; }
        public virtual object? MinValue => null;
        public virtual object? MaxValue => null;
    }

    public sealed class Int32Property : Property
    {
        public int Min { get; }
        public int Max { get; }

        public Int32Property(string name, int defaultValue = 0,
                             int min = int.MinValue, int max = int.MaxValue)
            : base(name, defaultValue)
        {
            Min = min;
            Max = max;
        }

        public override string TypeName => "int";
        public override object? MinValue => Min;
        public override object? MaxValue => Max;
    }

    public sealed class DoubleProperty : Property
    {
        public double Min { get; }
        public double Max { get; }

        public DoubleProperty(string name, double defaultValue = 0,
                              double min = double.MinValue,
                              double max = double.MaxValue)
            : base(name, defaultValue)
        {
            Min = min;
            Max = max;
        }

        public override string TypeName => "double";
        public override object? MinValue => Min;
        public override object? MaxValue => Max;
    }

    public sealed class BooleanProperty : Property
    {
        public BooleanProperty(string name, bool defaultValue = false)
            : base(name, defaultValue) { }

        public override string TypeName => "bool";
    }

    public sealed class StringProperty : Property
    {
        public StringProperty(string name, string defaultValue = "")
            : base(name, defaultValue) { }

        public override string TypeName => "string";
    }

    public sealed class PropertyCollection : IEnumerable<Property>
    {
        private readonly List<Property> _props;

        public PropertyCollection(IEnumerable<Property> props)
        {
            _props = props.ToList();
        }

        public Property this[string name] =>
            _props.First(p => p.Name == name);

        public bool Contains(string name) => _props.Any(p => p.Name == name);

        public IEnumerator<Property> GetEnumerator() => _props.GetEnumerator();

        IEnumerator IEnumerable.GetEnumerator() => GetEnumerator();
    }
}

namespace PaintDotNet.Effects
{
    using PaintDotNet.PropertySystem;

    /// The per-render parameter bag handed to OnRender.
    public sealed class PropertyBasedEffectConfigToken
    {
        private readonly Dictionary<string, object?> _values;

        public PropertyBasedEffectConfigToken(
            IReadOnlyDictionary<string, object?> values)
        {
            _values = new Dictionary<string, object?>(values);
        }

        public T GetPropertyValue<T>(string name) =>
            _values.TryGetValue(name, out var v) && v is not null
                ? (T)Convert.ChangeType(v, typeof(T))
                : default!;
    }

    public abstract class Effect
    {
        public abstract string Name { get; }
        public virtual string? SubmenuName => null;
    }

    /// The plugin base class this host drives: declare your properties,
    /// then render src -> dst with the chosen values.
    public abstract class PropertyBasedEffect : Effect
    {
        public abstract PropertyCollection OnCreatePropertyCollection();

        public abstract void OnRender(Surface dst, Surface src,
                                      PropertyBasedEffectConfigToken token);
    }
}
