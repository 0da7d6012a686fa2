# -*- coding: utf-8 -*-
"""Configuration tree for gaussiancity_tpu.

A serializable dataclass mirror of the reference EasyDict config
(reference: config.py:13-177).  Unlike the reference — which ``exec``'s a
Python file — configs here are plain dataclasses that serialize to/from
nested dicts (and therefore JSON), so checkpoints stay self-describing
without executing code.

Recipe presets for the three published generators (REST/background,
BLDG/buildings, CAR) are provided as constructors at the bottom
(reference: README.md:125-167).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


def _asdict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _asdict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_asdict(v) for v in obj]
    if isinstance(obj, dict):
        return {k: _asdict(v) for k, v in obj.items()}
    return obj


def _fromdict(cls: Any, data: Any) -> Any:
    if dataclasses.is_dataclass(cls) and isinstance(data, dict):
        import typing

        # Resolve string annotations (PEP 563) to real types.
        hints = typing.get_type_hints(cls)
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in data:
                continue
            v = data[f.name]
            ftype = hints.get(f.name, f.type)
            # unwrap Optional[X]
            if getattr(ftype, "__origin__", None) is typing.Union:
                args = [a for a in ftype.__args__ if a is not type(None)]
                if len(args) == 1:
                    ftype = args[0]
            origin = getattr(ftype, "__origin__", None)
            if dataclasses.is_dataclass(ftype) and isinstance(v, dict):
                kwargs[f.name] = _fromdict(ftype, v)
            elif (origin is tuple or isinstance(v, list)) and isinstance(
                    v, (list, tuple)):
                # deep-convert so nested tuples (e.g. bin_tiers) stay
                # hashable after a JSON roundtrip
                kwargs[f.name] = tuple(
                    tuple(e) if isinstance(e, (list, tuple)) else e
                    for e in v)
            else:
                kwargs[f.name] = v
        return cls(**kwargs)
    return data


class _Base:
    def to_dict(self) -> Dict[str, Any]:
        return _asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_dict(cls, data: Dict[str, Any]):
        return _fromdict(cls, data)

    @classmethod
    def from_json(cls, s: str):
        return cls.from_dict(json.loads(s))

    def replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)


# ---------------------------------------------------------------------------
# Datasets (reference: config.py:19-74)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DatasetConfig(_Base):
    name: str = "GOOGLE_EARTH"
    dir: str = "./data/google-earth"
    pin_memory: Tuple[str, ...] = ("Rt", "centers")
    n_repeat: int = 1
    n_cities: int = 400
    n_views: int = 60
    train_n_instances: Optional[int] = None
    train_instance_range: Optional[Tuple[int, int]] = None
    train_crop_size: Tuple[int, int] = (448, 448)
    test_n_instances: Optional[int] = None
    test_instance_range: Optional[Tuple[int, int]] = None
    test_crop_size: Tuple[int, int] = (720, 405)
    train_min_pixels: int = 64
    train_max_points: int = 16384
    cam_k: Tuple[float, ...] = (
        1528.1469407006614, 0.0, 480.0,
        0.0, 1528.1469407006614, 270.0,
        0.0, 0.0, 1.0,
    )
    sensor_size: Tuple[int, int] = (960, 540)  # (W, H)
    flip_ud: bool = False
    n_classes: int = 8
    proj_size: int = 2048
    bldg_range: Tuple[int, int] = (100, 32768)
    bldg_facade_clsid: int = 2
    bldg_roof_clsid: int = 7
    car_range: Optional[Tuple[int, int]] = None
    car_clsid: Optional[int] = None
    z_scale_special_classes: Tuple[int, ...] = (1, 5, 6)  # ROAD, WATER, ZONE
    map_size: int = 2048
    scale: int = 1
    view_index_file: Optional[str] = None


def google_earth_dataset() -> DatasetConfig:
    return DatasetConfig()


def kitti_360_dataset() -> DatasetConfig:
    # reference: config.py:48-74
    return DatasetConfig(
        name="KITTI_360",
        dir="./data/kitti-360/processed",
        view_index_file="./data/kitti-360/views.json",
        train_crop_size=(448, 224),
        test_crop_size=(704, 376),
        cam_k=(
            552.554261, 0.0, 682.049453,
            0.0, 552.554261, 238.769549,
            0.0, 0.0, 1.0,
        ),
        sensor_size=(1408, 376),
        flip_ud=True,
        bldg_range=(100, 10000),
        car_range=(10000, 16384),
        car_clsid=3,
        z_scale_special_classes=(1, 6),  # ROAD, ZONE
        map_size=0,
    )


# ---------------------------------------------------------------------------
# Rasterizer (TPU-native; replaces diff_gaussian_rasterization constants,
# reference: cuda_rasterizer/config.h:15-17 + rasterizer_impl.cu capacity logic)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RasterizerConfig(_Base):
    # TPU-native pixel tile — the analogue of the reference's 16x16 CUDA
    # block (config.h:15).  The Pallas kernel always computes on (8, 128)
    # f32 vregs; any (tile_h, tile_w) with tile_h * tile_w == 1024 and
    # tile_h == 8 * (128 // tile_w) maps onto one vreg via the strip
    # layout (blend_pallas.py module doc).  The default 32x32 SQUARE tile
    # costs the same 1024 pixels per blended pair but covers ~1.4x fewer
    # tiles per (near-isotropic) Gaussian than the vreg-shaped 8x128,
    # cutting pair count through binning/gather/blend by that factor.
    tile_h: int = 32
    tile_w: int = 32
    # Static per-Gaussian duplication cap: max number of tiles one Gaussian
    # may be binned into (the reference's tiles_touched is dynamic;
    # forward.cu:232). Gaussians overflowing the cap have their binned tile
    # set clipped around the projected center.
    max_tiles_per_gaussian: int = 32
    # Tiered duplication (binning.py module doc): the (count) largest-rect
    # Gaussians expand under (tile_cap) tiles instead of the main cap, so a
    # few near-camera Gaussians spanning hundreds of tiles never drop pairs
    # (the reference duplicates uncapped, rasterizer_impl.cu:64-99) while
    # the pair sort stays ~the true pair count.  tile_cap 0 = full grid.
    # () disables tiering (uniform max_tiles_per_gaussian cap).
    # Default caps dominate the historical uniform cap of 32 at every
    # rank (the 16384 largest rects get >= 32 tiles; larger ranks fall to
    # max_tiles_per_gaussian = 32), so defaults never drop MORE pairs
    # than a uniform-32 cap while whales keep the full grid.
    bin_tiers: Tuple[Tuple[int, int], ...] = (
        (16384, 32), (4096, 64), (1024, 128), (128, 0))
    # Static per-tile capacity: max Gaussians blended per tile, nearest-first
    # (the reference's per-tile ranges are dynamic; rasterizer_impl.cu:101-124).
    tile_capacity: int = 1024
    # Blending constants (reference: forward.cu:308-324)
    alpha_min: float = 1.0 / 255.0
    alpha_max: float = 0.99
    transmittance_eps: float = 1e-4
    near_z: float = 0.2
    # Backward slot budget per tile (pallas backend): gradients are
    # scattered back to Gaussians only for the first grad_capacity slots.
    # Blending saturates front-to-back, so slots past the tile's deepest
    # n_contrib carry provably-zero gradient (reference backward visits
    # only k < n_contrib, backward.cu:509-513) — bounding the scatter
    # skips the dominant cost of the VJP transpose.  Exactness is
    # reported by RenderOutput.n_grad_truncated (0 = gradients are
    # bit-identical to the unbounded scatter).  0 = unbounded.
    grad_capacity: int = 0
    # >0: compact the backward scatter to this many total rows across all
    # tiles (positions k < per-tile gradient depth only), instead of the
    # dense [tiles, grad_capacity] scatter.  Overflow is counted in
    # n_grad_truncated.  0 = dense scatter.
    grad_budget: int = 0
    # >0: only the visible_cap largest-rect Gaussians expand into
    # (tile, depth) pairs at all (binning.py::bin_gaussians) — city-scale
    # clouds keep most points outside the frustum, and the dense pair
    # expansion would sort max_tiles_per_gaussian slots for every one of
    # them.  Exact (n_dropped_pairs == 0) whenever the cap covers every
    # nonzero-area Gaussian; overflow is counted in n_dropped_pairs.
    # 0 = every Gaussian expands.
    visible_cap: int = 0
    # Reference 16x16-block gating: the CUDA reference only lets a
    # Gaussian touch pixels whose 16x16 block (config.h:15 BLOCK_X/Y)
    # lies inside its getRect() bbox, so fringe pixels with alpha >=
    # 1/255 just outside the bbox are gated by the block grid.  With
    # this on, the render applies exactly that test per (pixel, slot) —
    # making the output independent of this repo's own tile shape and
    # bit-comparable to the reference renderer — at ~a few extra vector
    # ops per blended pair.
    ref_tile16_gate: bool = True
    # Chunk size of the k-loop in the blend kernels.
    chunk: int = 8
    backend: str = "auto"  # "pallas" | "xla" | "auto"
    # Pallas slot-page size (lane width of one packed attribute chunk and
    # the granularity of the kernels' early-exit checks). 0 = auto
    # (128 on TPU, 16 in CPU interpret mode). Smaller pages exit earlier
    # on saturated tiles at the cost of more (padded) chunk loads.
    page: int = 0


# ---------------------------------------------------------------------------
# Network (reference: config.py:114-143)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PTv3Config(_Base):
    enabled: bool = True
    order: Tuple[str, ...] = ("cord",)
    stride: Tuple[int, ...] = (2, 2, 2, 2)
    enc_depths: Tuple[int, ...] = (2, 2, 2, 6, 2)
    enc_channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    enc_n_head: Tuple[int, ...] = (2, 4, 8, 16, 32)
    enc_patch_size: Tuple[int, ...] = (1024, 1024, 1024, 1024, 1024)
    dec_depths: Tuple[int, ...] = (2, 2, 2, 2)
    dec_channels: Tuple[int, ...] = (64, 64, 128, 256)
    dec_n_head: Tuple[int, ...] = (4, 4, 8, 16)
    dec_patch_size: Tuple[int, ...] = (1024, 1024, 1024, 1024)
    mlp_ratio: float = 4.0
    enable_cpe: bool = True
    # Relative-position attention bias (reference models/pt_v3.py:604-626).
    # No reference config enables it (flash attention asserts it off);
    # ported for completeness.
    enable_rpe: bool = False
    # Randomly permute which serialization order each block sees, per
    # forward (reference models/pt_v3.py:1024-1030, default True there).
    # A no-op for the single-order ("cord",) GaussianCity configs; needs a
    # "shuffle" rng stream from the caller to take effect.
    shuffle_orders: bool = True
    # Static capacity divisor per pooled stage (1 = keep full point count;
    # the reference shrinks dynamically via torch.unique). Real shell data
    # merges >= 8 points/cluster, so 2 is conservative.
    pool_capacity_divisor: int = 1
    # Rematerialize attention logits / conv gathers in the backward:
    # ~1.7 GB of residuals saved at 16k points for ~18 ms/step recompute.
    # Off by default (training shapes fit HBM; fwd-only inference never
    # materializes backward residuals).
    remat: bool = False
    # SubMConv neighbor search via a dense [extent^3] voxel id-map
    # instead of the sorted merge (models/ptv3.py::subm_neighbors_dense;
    # measured 37.9 -> ~8 ms for the k5 stem at 16k points).  Every PTv3
    # recipe feeds per-instance normalized coords (extent <= ~200 at
    # grid_size 0.01); out-of-extent points are counted in the
    # PTv3NbrOverflow diagnostic.  0 = sorted-merge path.
    dense_nbr_extent: int = 256


@dataclass(frozen=True)
class GaussianNetworkConfig(_Base):
    scale_factor: float = 0.65
    encoder: Optional[str] = "GLOBAL"  # "GLOBAL" | "LOCAL" | None
    encoder_out_dim: int = 5
    global_encoder_n_blocks: int = 6
    pos_emd: str = "HASH_GRID"  # "HASH_GRID" | "SIN_COS"
    hash_grid_n_levels: int = 16
    hash_grid_level_dim: int = 8
    hash_grid_map_size: int = 19  # log2 hashmap size (reference grid_encoder default)
    hash_grid_base_res: int = 16
    sin_cos_freq_bends: int = 10
    z_dim: Optional[int] = None  # None | 256
    mlp_hidden_dim: int = 512
    mlp_n_shared_layers: int = 1
    attr_factors: Dict[str, float] = field(default_factory=lambda: {"rgb": 2.0})
    attr_n_layers: Dict[str, int] = field(default_factory=lambda: {"rgb": 1})
    dis_n_channel_base: int = 128
    ptv3: PTv3Config = field(default_factory=PTv3Config)
    # Generator compute dtype ("float32" | "bfloat16"): params and loss
    # math stay f32; matmuls/attention/gathers run in bf16 with f32
    # accumulation on the MXU.  Norm statistics and the attribute
    # squashing always compute in f32.
    compute_dtype: str = "float32"


# ---------------------------------------------------------------------------
# Train / test (reference: config.py:148-176)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GeneratorOptim(_Base):
    lr: float = 1e-4


@dataclass(frozen=True)
class DiscriminatorOptim(_Base):
    enabled: bool = True
    lr: float = 1e-5
    n_warmup_iters: int = 100000


@dataclass(frozen=True)
class TrainConfig(_Base):
    batch_size: int = 1
    eps: float = 1e-8
    weight_decay: float = 0.0
    betas: Tuple[float, float] = (0.9, 0.999)
    # Training without the converted ImageNet VGG19 weights
    # (GAUSSIANCITY_VGG19_NPZ) makes the perceptual term random-feature L1
    # — quality parity is impossible.  Opt in explicitly (or set
    # GAUSSIANCITY_ALLOW_RANDOM_VGG=1, e.g. for tests/benchmarks);
    # otherwise Trainer construction refuses.
    allow_random_vgg: bool = False
    perceptual_loss_model: str = "vgg19"
    perceptual_loss_layers: Tuple[str, ...] = ("relu_3_1", "relu_4_1", "relu_5_1")
    perceptual_loss_weights: Tuple[float, ...] = (0.125, 0.25, 1.0)
    n_epochs: int = 500
    l1_loss_factor: float = 10.0
    perceptual_loss_factor: float = 10.0
    gan_loss_factor: float = 0.5
    ckpt_save_freq: int = 25
    # Metrics are accumulated on-device and fetched to the host only every
    # log_freq batches: a per-batch float() fetch is a device->host round
    # trip per step that can dominate the step itself over a remote device
    # link (CLAUDE.md benchmark rules).
    log_freq: int = 10
    generator: GeneratorOptim = field(default_factory=GeneratorOptim)
    discriminator: DiscriminatorOptim = field(default_factory=DiscriminatorOptim)
    # TPU-native additions
    seed: int = 0
    max_points: int = 16384  # static padded point budget per sample
    param_dtype: str = "float32"
    compute_dtype: str = "float32"
    # host input pipeline (reference: 8 persistent workers,
    # core/train.py:34-64); 0 = synchronous loading
    n_workers: int = 8
    prefetch_batches: int = 8


@dataclass(frozen=True)
class TestConfig(_Base):
    test_freq: int = 1


# ---------------------------------------------------------------------------
# Parallelism (TPU-native; replaces utils/distributed.py NCCL/DDP)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ParallelConfig(_Base):
    # Mesh axis sizes; -1 on data means "all remaining devices".
    data_axis: int = -1
    tile_axis: int = 1  # shards rasterizer pixel tiles / gaussians for giant scenes


# ---------------------------------------------------------------------------
# IO byte-cache (reference: config.py MEMCACHED block + utils/io.py:26-35,
# there the closed SenseTime `mc` client; here stock memcached — see
# data/memcache.py)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MemcachedConfig(_Base):
    enabled: bool = False
    servers: Tuple[str, ...] = ("127.0.0.1:11211",)  # "host:port"
    timeout_s: float = 2.0


# ---------------------------------------------------------------------------
# Root config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Config(_Base):
    exp_name: str = ""
    dataset: DatasetConfig = field(default_factory=google_earth_dataset)
    network: GaussianNetworkConfig = field(default_factory=GaussianNetworkConfig)
    rasterizer: RasterizerConfig = field(default_factory=RasterizerConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    test: TestConfig = field(default_factory=TestConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    memcached: MemcachedConfig = field(default_factory=MemcachedConfig)
    output_dir: str = "./output"
    n_workers: int = 8


# ---------------------------------------------------------------------------
# Recipe presets (reference: README.md:125-167)
# ---------------------------------------------------------------------------


def _recipe_rasterizer() -> RasterizerConfig:
    """Training-shape rasterizer: 16k points / 640x448 crops.  The
    compacted backward (grad_budget) covers sum-of-depth with large
    headroom; RasterGradTruncated in the train metrics flags any scene
    that exceeds it (gradients stay exact while it reads 0)."""
    return RasterizerConfig(grad_budget=65536)


def rest_recipe(dataset: str = "GOOGLE_EARTH") -> Config:
    """Background (REST) generator: GLOBAL encoder, hash-grid, PTv3 off."""
    ds = google_earth_dataset() if dataset == "GOOGLE_EARTH" else kitti_360_dataset()
    ds = ds.replace(
        train_instance_range=(0, 100),
        test_instance_range=(0, 100),
        train_crop_size=(640, 448),
    )
    net = GaussianNetworkConfig(
        scale_factor=0.5,
        encoder="GLOBAL",
        encoder_out_dim=5,
        pos_emd="HASH_GRID",
        z_dim=None,
        ptv3=PTv3Config(enabled=False),
    )
    return Config(exp_name="REST", dataset=ds, network=net,
                  rasterizer=_recipe_rasterizer())


def bldg_recipe(dataset: str = "GOOGLE_EARTH") -> Config:
    """Building generator: no encoder, sin/cos, per-instance z, PTv3 on."""
    ds = google_earth_dataset() if dataset == "GOOGLE_EARTH" else kitti_360_dataset()
    ds = ds.replace(
        train_n_instances=1,
        train_instance_range=(10, 16384),
        test_n_instances=1,
        test_instance_range=(10, 16384),
        train_crop_size=(640, 448),
    )
    net = GaussianNetworkConfig(
        scale_factor=0.65,
        encoder=None,
        encoder_out_dim=3,
        pos_emd="SIN_COS",
        z_dim=256,
        ptv3=PTv3Config(enabled=True, pool_capacity_divisor=2),
    )
    return Config(exp_name="BLDG", dataset=ds, network=net,
                  rasterizer=_recipe_rasterizer())


def car_recipe() -> Config:
    """Car generator (KITTI-360 only)."""
    ds = kitti_360_dataset().replace(
        train_n_instances=1,
        train_instance_range=(10000, 16384),
        test_n_instances=1,
        test_instance_range=(10000, 16384),
    )
    net = GaussianNetworkConfig(
        scale_factor=0.65,
        encoder=None,
        encoder_out_dim=3,
        pos_emd="SIN_COS",
        z_dim=256,
        ptv3=PTv3Config(enabled=True),
    )
    return Config(exp_name="CAR", dataset=ds, network=net,
                  rasterizer=_recipe_rasterizer())
