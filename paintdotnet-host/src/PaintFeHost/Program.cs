// PaintFeHost — loads a Paint.NET PropertyBasedEffect plugin DLL and
// serves it over paintfe-tpu's line-delimited JSON plugin protocol
// (paintfe_tpu/ops/plugins.py):
//
//   -> {"cmd": "describe"}
//   <- {"name": ..., "effects": [{"id", "name", "params": [...]}]}
//   -> {"cmd": "render", "effect": id, "width": W, "height": H,
//       "params": {...}, "pixels_b64": base64 RGBA}
//   <- {"ok": true, "pixels_b64": base64 RGBA}
//
// Usage: dotnet PaintFeHost.dll <plugin.dll>
//
// Crash isolation is the process boundary (the reference's model,
// src/paintdotnet_plugins.rs:485-607): a plugin exception answers
// {"ok": false, "error": ...}; a hard crash ends the process and the
// Python side reports PluginError.

using System.Reflection;
using System.Runtime.Loader;
using System.Text.Json;
using System.Text.Json.Nodes;
using PaintDotNet;
using PaintDotNet.Effects;
using PaintDotNet.PropertySystem;

if (args.Length != 1)
{
    Console.Error.WriteLine("usage: PaintFeHost <plugin.dll>");
    return 2;
}

var pluginPath = Path.GetFullPath(args[0]);
Assembly assembly;
Type[] effectTypes;
try
{
    var loader = new PluginLoadContext(pluginPath);
    assembly = loader.LoadFromAssemblyPath(pluginPath);
    effectTypes = assembly.GetTypes()
        .Where(t => !t.IsAbstract && typeof(PropertyBasedEffect).IsAssignableFrom(t))
        .ToArray();
    if (effectTypes.Length == 0)
        throw new NotSupportedException("no PropertyBasedEffect types in plugin");
}
catch (Exception e)
{
    Console.Error.WriteLine($"plugin load failed: {e.Message}");
    return 3;
}

string? line;
while ((line = Console.ReadLine()) != null)
{
    JsonNode? reply;
    try
    {
        var req = JsonNode.Parse(line)!;
        reply = (string?)req["cmd"] switch
        {
            "describe" => Describe(),
            "render" => Render(req),
            var other => Error($"unknown command '{other}'"),
        };
    }
    catch (Exception e)
    {
        reply = Error(e.InnerException?.Message ?? e.Message);
    }
    Console.WriteLine(reply!.ToJsonString());
}
return 0;

JsonNode Describe()
{
    var effects = new JsonArray();
    foreach (var t in effectTypes)
    {
        var effect = (PropertyBasedEffect)Activator.CreateInstance(t)!;
        var props = new JsonArray();
        foreach (var p in effect.OnCreatePropertyCollection())
        {
            var entry = new JsonObject
            {
                ["name"] = p.Name,
                ["type"] = p.TypeName,
                ["default"] = JsonValue.Create(p.Value),
            };
            if (p.MinValue is not null) entry["min"] = JsonValue.Create(p.MinValue);
            if (p.MaxValue is not null) entry["max"] = JsonValue.Create(p.MaxValue);
            props.Add(entry);
        }
        effects.Add(new JsonObject
        {
            ["id"] = t.FullName,
            ["name"] = effect.Name,
            ["submenu"] = effect.SubmenuName,
            ["params"] = props,
        });
    }
    return new JsonObject
    {
        ["name"] = assembly.GetName().Name,
        ["effects"] = effects,
    };
}

JsonNode Render(JsonNode req)
{
    var id = (string?)req["effect"];
    var type = effectTypes.FirstOrDefault(t => t.FullName == id)
        ?? throw new InvalidOperationException($"unknown effect '{id}'");
    var effect = (PropertyBasedEffect)Activator.CreateInstance(type)!;
    int w = (int)req["width"]!;
    int h = (int)req["height"]!;
    var rgba = Convert.FromBase64String((string)req["pixels_b64"]!);
    if (rgba.Length != w * h * 4)
        throw new InvalidOperationException("pixel payload size mismatch");

    // merge declared defaults with the request's overrides
    var values = new Dictionary<string, object?>();
    foreach (var p in effect.OnCreatePropertyCollection())
        values[p.Name] = p.Value;
    if (req["params"] is JsonObject overrides)
        foreach (var (k, v) in overrides)
            values[k] = v switch
            {
                JsonValue jv when jv.TryGetValue(out int i) => i,
                JsonValue jv when jv.TryGetValue(out double d) => d,
                JsonValue jv when jv.TryGetValue(out bool b) => b,
                JsonValue jv when jv.TryGetValue(out string? s) => s,
                _ => null,
            };

    var src = Surface.FromRgbaBytes(w, h, rgba);
    var dst = new Surface(w, h);
    dst.CopyFrom(src);
    effect.OnRender(dst, src, new PropertyBasedEffectConfigToken(values));
    return new JsonObject
    {
        ["ok"] = true,
        ["pixels_b64"] = Convert.ToBase64String(dst.ToRgbaBytes()),
    };
}

static JsonNode Error(string message) => new JsonObject
{
    ["ok"] = false,
    ["error"] = message,
};

/// Isolated load context that resolves the plugin's PaintDotNet.*
/// references against this host's stub assembly.
sealed class PluginLoadContext : AssemblyLoadContext
{
    private readonly AssemblyDependencyResolver _resolver;

    public PluginLoadContext(string pluginPath) : base(isCollectible: false)
    {
        _resolver = new AssemblyDependencyResolver(pluginPath);
    }

    protected override Assembly? Load(AssemblyName name)
    {
        // PaintDotNet.* (and the host itself) bind to our stubs
        if (name.Name is not null &&
            (name.Name.StartsWith("PaintDotNet") || name.Name == "PaintFeHost"))
            return typeof(PaintDotNet.Surface).Assembly;
        var path = _resolver.ResolveAssemblyToPath(name);
        return path is null ? null : LoadFromAssemblyPath(path);
    }
}
