"""Options: typed key/value reflection over RenderParams.

TPU-native rebuild of the reference's pl_options (src/options.c,
src/include/libplacebo/options.h): a table of typed option descriptors
with bounds and presets, string parse/save in
"preset=high_quality,upscaler=ewa_lanczos,deband=yes" form, and
iteration over non-default values.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, replace
from typing import Any, Callable, Dict, List, Optional, Tuple

__all__ = ["Options", "OptionError", "OPTION_TABLE"]


class OptionError(ValueError):
    pass


@dataclass(frozen=True)
class _Opt:
    key: str
    type: str                 # bool | int | float | str | enum
    get: Callable             # params -> value
    set: Callable             # (params, value) -> params
    minimum: float = 0.0
    maximum: float = 0.0
    choices: Tuple[str, ...] = ()
    description: str = ""


def _parse_bool(v: str) -> bool:
    s = v.strip().lower()
    if s in ("yes", "y", "on", "true", "enabled", "1"):
        return True
    if s in ("no", "n", "off", "false", "disabled", "0", "none"):
        return False
    raise OptionError(f"invalid boolean: {v!r}")


def _build_table() -> List[_Opt]:
    from ..ops.deband import DebandParams
    from ..ops.dithering import DitherParams
    from ..ops.peak_detect import PeakDetectParams
    from ..core.dither import DitherMethod
    from .filters import FILTER_CONFIGS
    from .tone_mapping import TONE_MAP_FUNCTIONS

    filter_names = tuple(c.name for c in FILTER_CONFIGS)
    tm_names = tuple(f.name for f in TONE_MAP_FUNCTIONS)

    def scaler_opt(key, field):
        return _Opt(
            key, "enum",
            get=lambda p: getattr(p, field),
            set=lambda p, v: replace(p, **{field: v}),
            choices=filter_names,
            description=f"{field} filter")

    def sub_opt(key, typ, holder, field, default_factory, lo=0.0, hi=0.0,
                choices=()):
        """Option on a nested params object; setting it enables the
        feature with defaults if currently disabled."""
        def get(p):
            sub = getattr(p, holder)
            return getattr(sub, field) if sub is not None else None

        def setv(p, v):
            sub = getattr(p, holder) or default_factory()
            return replace(p, **{holder: replace(sub, **{field: v})})
        return _Opt(key, typ, get, setv, lo, hi, choices)

    def feature_toggle(key, holder, default_factory):
        def get(p):
            return getattr(p, holder) is not None

        def setv(p, v):
            cur = getattr(p, holder)
            if v and cur is None:
                return replace(p, **{holder: default_factory()})
            if not v:
                return replace(p, **{holder: None})
            return p
        return _Opt(key, "bool", get, setv,
                    description=f"enable {key}")

    table = [
        scaler_opt("upscaler", "upscaler"),
        scaler_opt("downscaler", "downscaler"),
        scaler_opt("plane_upscaler", "plane_upscaler"),
        scaler_opt("frame_mixer", "frame_mixer"),
        _Opt("antiringing_strength", "float",
             lambda p: p.antiringing_strength,
             lambda p, v: replace(p, antiringing_strength=v), 0.0, 1.0),
        _Opt("linear_scaling", "bool",
             lambda p: p.linear_scaling,
             lambda p, v: replace(p, linear_scaling=v)),
        _Opt("sigmoid", "bool",
             lambda p: p.sigmoid is not None,
             lambda p, v: replace(p, sigmoid=(0.75, 6.5) if v else None)),
        _Opt("sigmoid_center", "float",
             lambda p: p.sigmoid[0] if p.sigmoid else None,
             lambda p, v: replace(p, sigmoid=(v, (p.sigmoid or (0.75, 6.5))[1])),
             0.0, 1.0),
        _Opt("sigmoid_slope", "float",
             lambda p: p.sigmoid[1] if p.sigmoid else None,
             lambda p, v: replace(p, sigmoid=((p.sigmoid or (0.75, 6.5))[0], v)),
             1.0, 20.0),
        _Opt("tone_mapping", "enum",
             lambda p: p.tone_mapping_function,
             lambda p, v: replace(p, tone_mapping_function=v),
             choices=tm_names),
        _Opt("gamut_mapping", "enum",
             lambda p: p.gamut_mapping,
             lambda p, v: replace(p, gamut_mapping=v),
             choices=("clip", "perceptual", "softclip", "relative",
                      "desaturate", "saturation", "linear", "darken",
                      "none")),
        _Opt("contrast_recovery", "float",
             lambda p: p.contrast_recovery,
             lambda p, v: replace(p, contrast_recovery=v), 0.0, 2.0),
        _Opt("background", "enum",
             lambda p: p.background,
             lambda p, v: replace(p, background=v),
             choices=("color", "tiles")),
        _Opt("error_diffusion", "str",
             lambda p: p.error_diffusion,
             lambda p, v: replace(p, error_diffusion=v or None)),
        _Opt("film_grain", "bool",
             lambda p: p.film_grain,
             lambda p, v: replace(p, film_grain=v)),
        # feature toggles + nested fields
        feature_toggle("deband", "deband",
                       lambda: __import__(
                           "libplacebo_tpu.ops.deband",
                           fromlist=["DebandParams"]).DebandParams()),
        sub_opt("deband_iterations", "int", "deband", "iterations",
                lambda: DebandParams(), 0, 16),
        sub_opt("deband_threshold", "float", "deband", "threshold",
                lambda: DebandParams(), 0.0, 1000.0),
        sub_opt("deband_radius", "float", "deband", "radius",
                lambda: DebandParams(), 0.0, 1000.0),
        sub_opt("deband_grain", "float", "deband", "grain",
                lambda: DebandParams(), 0.0, 1000.0),
        feature_toggle("peak_detect", "peak_detect",
                       lambda: PeakDetectParams()),
        sub_opt("peak_smoothing_period", "float", "peak_detect",
                "smoothing_period", lambda: PeakDetectParams(), 0.0, 1000.0),
        sub_opt("peak_percentile", "float", "peak_detect", "percentile",
                lambda: PeakDetectParams(), 0.0, 100.0),
        sub_opt("scene_threshold_low", "float", "peak_detect",
                "scene_threshold_low", lambda: PeakDetectParams(), 0.0, 20.0),
        sub_opt("scene_threshold_high", "float", "peak_detect",
                "scene_threshold_high", lambda: PeakDetectParams(), 0.0, 20.0),
        feature_toggle("dither", "dither", lambda: DitherParams()),
        sub_opt("dither_method", "enum", "dither", "method",
                lambda: DitherParams(),
                choices=tuple(m.value for m in DitherMethod)),
        sub_opt("dither_temporal", "bool", "dither", "temporal",
                lambda: DitherParams()),
    ]
    return table


_TABLE: Optional[List[_Opt]] = None


def OPTION_TABLE() -> List[_Opt]:
    global _TABLE
    if _TABLE is None:
        _TABLE = _build_table()
    return _TABLE


class Options:
    """Reference pl_options: holds a RenderParams and lets you
    inspect/mutate it through typed string options."""

    def __init__(self, params=None):
        from ..render.renderer import DEFAULT_PARAMS
        self.params = params or DEFAULT_PARAMS
        self._by_key = {o.key: o for o in OPTION_TABLE()}

    # -- presets (reference "preset=" pseudo-option) -------------------

    def _apply_preset(self, name: str):
        from ..render import renderer as r
        presets = {"fast": r.FAST_PARAMS, "default": r.DEFAULT_PARAMS,
                   "high_quality": r.HIGH_QUALITY_PARAMS}
        if name not in presets:
            raise OptionError(f"unknown preset: {name!r}")
        self.params = presets[name]

    # -- set/get -------------------------------------------------------

    def set(self, key: str, value: str):
        """Reference pl_options_set_str."""
        if key == "preset":
            self._apply_preset(value)
            return
        opt = self._by_key.get(key)
        if opt is None:
            raise OptionError(f"unknown option: {key!r}")
        if opt.type == "bool":
            v = _parse_bool(value)
        elif opt.type == "int":
            try:
                v = int(value)
            except ValueError:
                raise OptionError(f"invalid integer for {key}: {value!r}")
            if opt.minimum != opt.maximum:
                v = int(min(max(v, opt.minimum), opt.maximum))
        elif opt.type == "float":
            try:
                v = float(value)
            except ValueError:
                raise OptionError(f"invalid number for {key}: {value!r}")
            if opt.minimum != opt.maximum:
                v = min(max(v, opt.minimum), opt.maximum)
        elif opt.type == "enum":
            if opt.choices and value not in opt.choices:
                raise OptionError(
                    f"invalid value {value!r} for {key}; "
                    f"choices: {', '.join(opt.choices)}")
            v = value
            if key == "dither_method":
                from .dither import DitherMethod
                v = DitherMethod(value)
        else:
            v = value
        self.params = opt.set(self.params, v)

    def get(self, key: str):
        opt = self._by_key.get(key)
        if opt is None:
            raise OptionError(f"unknown option: {key!r}")
        v = opt.get(self.params)
        if hasattr(v, "value"):
            v = v.value
        return v

    def parse(self, s: str):
        """Parse "k=v,k=v" strings (reference pl_options_load)."""
        for part in s.split(","):
            part = part.strip()
            if not part:
                continue
            if "=" not in part:
                raise OptionError(f"malformed option: {part!r}")
            k, v = part.split("=", 1)
            self.set(k.strip(), v.strip())

    def save(self) -> str:
        """Serialize non-default options (reference pl_options_save)."""
        from ..render.renderer import DEFAULT_PARAMS
        defaults = Options(DEFAULT_PARAMS)
        out = []
        for opt in OPTION_TABLE():
            cur = self.get(opt.key)
            dfl = defaults.get(opt.key)
            if cur != dfl and cur is not None:
                if isinstance(cur, bool):
                    cur = "yes" if cur else "no"
                out.append(f"{opt.key}={cur}")
        return ",".join(out)

    def iterate(self):
        """Yield (key, value) for every option."""
        for opt in OPTION_TABLE():
            yield opt.key, self.get(opt.key)
