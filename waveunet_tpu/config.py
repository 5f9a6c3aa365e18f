"""Typed configuration registry for the TPU-native Wave-U-Net framework.

Replaces the reference's sacred ``Ingredient("cfg")`` dict (`/root/reference/Config.py:4-50`)
with a frozen dataclass plus a named-preset registry mirroring all eleven published
configurations (`/root/reference/Config.py:52-161`). CLI overrides take ``key=value``
pairs like sacred's ``with cfg.<name> key=value`` syntax.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Callable, Dict, Optional, Tuple

# Source-name tables per task (`/root/reference/Config.py:43-48`).
_TASK_SOURCES = {
    "multi_instrument": ("bass", "drums", "other", "vocals"),
    "voice": ("accompaniment", "vocals"),
}


@dataclasses.dataclass(frozen=True)
class Config:
    """Model + experiment configuration.

    Field defaults replicate the reference base config (`/root/reference/Config.py:9-39`).
    TPU-specific knobs (dtype, mesh, pallas) are additions with conservative defaults.
    """

    # --- paths ---
    musdb_path: str = "/data/MUSDB18"
    ccmixter_xml: str = "CCMixter.xml"
    estimates_path: str = "estimates"
    data_path: str = "data"
    model_base_dir: str = "checkpoints"
    log_dir: str = "logs"

    # --- optimisation ---
    batch_size: int = 16
    init_sup_sep_lr: float = 1e-4
    epoch_it: int = 2000
    worse_epochs: int = 20  # early-stopping patience

    # --- data pipeline ---
    cache_size: int = 4000
    num_workers: int = 4
    num_snippets_per_track: int = 100
    augmentation: bool = True
    # Validation split size out of the train set (the reference hardcodes 25,
    # `Datasets.py:140-142` — which nearly drains a small custom dataset's
    # train partition; the split never takes the last train song either way).
    num_val_songs: int = 25

    # --- architecture ---
    network: str = "unet"  # "unet" | "unet_spectrogram"
    num_layers: int = 12
    filter_size: int = 15
    merge_filter_size: int = 5
    input_filter_size: int = 15
    output_filter_size: int = 1
    num_initial_filters: int = 24
    num_frames: int = 16384
    expected_sr: int = 22050
    mono_downmix: bool = True
    output_type: str = "direct"  # "direct" | "difference"
    output_activation: str = "tanh"  # "tanh" | "linear"
    context: bool = False  # False => "same" padding, True => "valid"
    upsampling: str = "linear"  # "linear" | "learned"
    task: str = "voice"  # "voice" | "multi_instrument"
    raw_audio_loss: bool = True  # spectrogram net: True=L2 audio, False=L1 magnitude

    # Present in some reference presets but never read there
    # (`/root/reference/Config.py:107,131,145` — documented dead key). Kept for
    # preset fidelity / round-tripping.
    duration: Optional[int] = None

    # --- TPU-native additions ---
    seed: int = 1337  # reference fixes sacred seed 1337 (`Training.py:19-22`)
    compute_dtype: str = "float32"  # "float32" | "bfloat16" for conv compute
    # Rematerialise conv blocks in the backward pass (jax.checkpoint): trades
    # ~1 extra forward for O(depth) less activation memory — for very long
    # training windows / large batches on small chips.
    remat: bool = False
    # Keep the training source bank resident in device HBM (int16) and sample
    # snippets on device — zero host->device bytes per step. Falls back to the
    # host pipeline when the bank exceeds the budget below.
    device_data: bool = True
    device_data_max_bytes: int = 8 * 1024 ** 3
    # Run each epoch as ONE jitted lax.scan over (bank sample -> train step)
    # when training from the device bank on a single device — removes all
    # per-step dispatch overhead (train/step.py:make_scanned_epoch).
    scan_epoch: bool = True
    # Max lax.scan steps per dispatch of the scanned epoch. The epoch is cut
    # into ceil(epoch_it / scan_chunk) back-to-back dispatches of the SAME
    # compiled program (bit-exact: RNG keys fold on the absolute step index,
    # so the chunking is invisible to the training stream). Bounding a single
    # program's device time matters on runtimes with an execution watchdog:
    # the axon TPU worker crashes outright on one ~66 s program (a 2000-step
    # full_44KHz epoch) while ~33 s programs run fine — 250 steps/dispatch
    # (~8 s at the production scale) keeps a 4x margin at ~0.1% added
    # dispatch overhead. 0 disables chunking (one program per epoch).
    scan_chunk: int = 250
    # How many per-epoch checkpoints to retain (0 = all, like the reference's
    # Saver; the best-validation checkpoint is always kept).
    keep_checkpoints: int = 0
    use_pallas: bool = False  # use hand-written Pallas kernels for hot ops
    # How the down-path decimation (`UnetAudioSeparator.py:100` x[:, ::2, :])
    # is lowered. "dilate" folds it into the NEXT conv as stride-2 +
    # dilation-2 (bit-exact: conv(x[::2]) == dilated-strided conv(x)); XLA's
    # lowering of convs that consume strided slices devectorises on long
    # rows, so this is worth +15% forward at the 131072-frame window and
    # +45% at 262144 on v5e (tools/conv_cliff_probe*.py). "slice" keeps the
    # literal strided-slice formulation.
    decimate_lowering: str = "dilate"  # "dilate" | "slice"
    mesh_shape: Tuple[int, ...] = (-1,)  # data-parallel axis; -1 = all devices
    mesh_axis_names: Tuple[str, ...] = ("data",)
    infer_batch: int = 16  # windows per device batch in the inference engine
    # Inference window size (desired output samples per window).
    #   -1   = auto (DEFAULT): smallest pow2 window with <= 3x context overlap
    #          (ops/shapes.auto_infer_frames) — a measured 2-3x compute win for
    #          the context models, identity for the rest;
    #   None = num_frames, the reference's behavior (`Evaluate.py:34-39`) —
    #          what the byte-parity tests pin;
    #   int  = explicit window.
    # Larger windows amortise the valid-conv context: at 16384 the net
    # recomputes ~9x overlapped context (in 147k / out 16k); at 65536 the
    # overlap drops to 3.0x. Window choice changes the decimation phase each
    # output sample sees (x[::2] alignment), so outputs across window sizes
    # agree in quality but not bit-for-bit — see
    # tests/test_infer.py::test_auto_window_interior_invariance.
    infer_num_frames: Optional[int] = -1
    # Host->device wire format for full songs: "float32" (exact) or "int16"
    # (2x less transfer; bit-exact for PCM16-derived audio).
    infer_wire_dtype: str = "float32"
    # MXU pass-count for fp32 convs (jax.lax.Precision). The TPU MXU is a
    # bf16 multiplier; XLA emulates fp32 convs with 1 ("default"), 3 ("high"
    # / tensorfloat32-ish) or 6 ("highest") bf16 passes. None defers to
    # JAX's default / any ambient jax.default_matmul_precision scope.
    # tools/precision_probe.py measures speed + on-device golden parity of
    # all three on the real chip (DESIGN.md §1 MFU table).
    conv_precision: Optional[str] = None

    # --- derived (computed in __post_init__) ---
    source_names: Tuple[str, ...] = dataclasses.field(default=(), init=False)
    num_sources: int = dataclasses.field(default=0, init=False)
    num_channels: int = dataclasses.field(default=0, init=False)

    def __post_init__(self):
        if self.task not in _TASK_SOURCES:
            raise NotImplementedError(f"unknown task {self.task!r}")
        if self.network not in ("unet", "unet_spectrogram"):
            raise NotImplementedError(f"unknown network {self.network!r}")
        if self.output_type not in ("direct", "difference"):
            raise NotImplementedError(f"unknown output_type {self.output_type!r}")
        if self.output_activation not in ("tanh", "linear"):
            raise NotImplementedError(
                f"unknown output_activation {self.output_activation!r}")
        if self.upsampling not in ("linear", "learned"):
            raise NotImplementedError(f"unknown upsampling {self.upsampling!r}")
        if self.decimate_lowering not in ("dilate", "slice"):
            raise NotImplementedError(
                f"unknown decimate_lowering {self.decimate_lowering!r}")
        if self.conv_precision not in (None, "default", "high", "highest"):
            raise NotImplementedError(
                f"unknown conv_precision {self.conv_precision!r}")
        if self.num_val_songs < 0:
            # A negative value would flow into rng.choice(size=n) during
            # dataset preparation and die with an opaque numpy error.
            raise ValueError(
                f"num_val_songs must be >= 0, got {self.num_val_songs}")
        for fname in ("num_layers", "num_frames", "filter_size",
                      "merge_filter_size", "output_filter_size",
                      "num_initial_filters", "batch_size", "expected_sr",
                      "epoch_it", "num_snippets_per_track", "cache_size",
                      "num_workers", "worse_epochs", "infer_batch"):
            # zero/negative values here pass shape algebra in same-padding
            # mode and only explode much later (empty batches, zero-width
            # convs, Fraction(sr, 0) in the resampler) — reject a typo'd
            # override at config time instead. Fields with legitimate
            # sentinel values (infer_num_frames -1/None, scan_chunk 0,
            # keep_checkpoints 0, mesh_shape -1) are excluded.
            v = getattr(self, fname)
            if v < 1:
                raise ValueError(f"{fname} must be >= 1, got {v}")
        srcs = _TASK_SOURCES[self.task]
        object.__setattr__(self, "source_names", srcs)
        object.__setattr__(self, "num_sources", len(srcs))
        object.__setattr__(self, "num_channels", 1 if self.mono_downmix else 2)

    # -- convenience --------------------------------------------------------
    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        fields = {f.name for f in dataclasses.fields(cls) if f.init}
        kw = {k: v for k, v in d.items() if k in fields}
        for key in ("mesh_shape", "mesh_axis_names"):
            if key in kw and isinstance(kw[key], list):
                kw[key] = tuple(kw[key])
        return cls(**kw)


# ---------------------------------------------------------------------------
# Named presets — one per reference named config (`/root/reference/Config.py:52-161`).
# ---------------------------------------------------------------------------

_REGISTRY: Dict[str, Callable[[], Config]] = {}


def _register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


@_register("baseline")
def _baseline() -> Config:
    """M1: mono, same-padding, direct tanh output, linear upsampling."""
    return Config()


@_register("baseline_diff")
def _baseline_diff() -> Config:
    """M2: baseline + difference output (`Config.py:56-61`)."""
    return Config(output_type="difference")


@_register("baseline_context")
def _baseline_context() -> Config:
    """M3: difference output + input context / valid convs (`Config.py:63-69`)."""
    return Config(output_type="difference", context=True)


@_register("baseline_stereo")
def _baseline_stereo() -> Config:
    """M4: M3 + stereo I/O (`Config.py:71-78`)."""
    return Config(output_type="difference", context=True, mono_downmix=False)


@_register("full")
def _full() -> Config:
    """M5: M4 + learned upsampling (`Config.py:80-88`)."""
    return Config(output_type="difference", context=True, upsampling="learned",
                  mono_downmix=False)


@_register("full_44KHz")
def _full_44khz() -> Config:
    """M5-HighSR: M5 at 44.1 kHz (`Config.py:90-99`)."""
    return Config(output_type="difference", context=True, upsampling="learned",
                  mono_downmix=False, expected_sr=44100)


@_register("baseline_context_smallfilter_deep")
def _smallfilter_deep() -> Config:
    """14-layer small-filter variant (`Config.py:101-110`)."""
    return Config(output_type="difference", context=True, num_layers=14,
                  duration=7, filter_size=5, merge_filter_size=1)


@_register("full_multi_instrument")
def _full_multi() -> Config:
    """M6: multi-instrument separation with best model (`Config.py:112-121`)."""
    return Config(output_type="difference", context=True, upsampling="linear",
                  mono_downmix=False, task="multi_instrument")


@_register("baseline_comparison")
def _baseline_comparison() -> Config:
    """M7: comparison net matched to U-7 input size (`Config.py:123-134`)."""
    return Config(batch_size=4, output_type="difference", context=True,
                  num_frames=768 * 127 + 1024, duration=13, expected_sr=8192,
                  num_initial_filters=34)


@_register("unet_spectrogram")
def _unet_spectrogram() -> Config:
    """U7: spectrogram U-Net, L2 audio loss (`Config.py:136-147`)."""
    return Config(batch_size=4, network="unet_spectrogram", num_layers=6,
                  expected_sr=8192, num_frames=768 * 127 + 1024, duration=13,
                  num_initial_filters=16)


@_register("unet_spectrogram_l1")
def _unet_spectrogram_l1() -> Config:
    """U7a: spectrogram U-Net, L1 magnitude loss (`Config.py:149-161`)."""
    return Config(batch_size=4, network="unet_spectrogram", num_layers=6,
                  expected_sr=8192, num_frames=768 * 127 + 1024, duration=13,
                  num_initial_filters=16, raw_audio_loss=False)


def preset_names() -> Tuple[str, ...]:
    return tuple(sorted(_REGISTRY))


class ConfigError(Exception):
    """User-facing configuration error (unknown preset / override key).

    The CLI catches exactly this to print a clean message — catching broad
    KeyError there masked real bugs as config errors (round-2 review)."""


def get_config(name: str = "baseline", **overrides) -> Config:
    """Look up a named preset and apply keyword overrides."""
    if name not in _REGISTRY:
        raise ConfigError(
            f"unknown preset {name!r}; available: {preset_names()}")
    cfg = _REGISTRY[name]()
    if overrides:
        try:
            cfg = cfg.replace(**overrides)
        except TypeError as e:
            raise ConfigError(f"bad config override: {e}") from e
        except ValueError as e:
            # bad VALUE (e.g. batch_size=0) gets the same clean CLI
            # treatment as a bad key — the CLI catches exactly ConfigError
            raise ConfigError(f"bad config override value: {e}") from e
    return cfg


def _parse_value(raw: str) -> Any:
    try:
        return json.loads(raw)
    except (json.JSONDecodeError, ValueError):
        return raw


def config_from_cli(args) -> Config:
    """Parse ``[preset] [key=value ...]`` CLI fragments into a Config."""
    name = "baseline"
    overrides: Dict[str, Any] = {}
    for a in args:
        if "=" in a:
            k, v = a.split("=", 1)
            overrides[k] = _parse_value(v)
        else:
            name = a
    return get_config(name, **overrides)
