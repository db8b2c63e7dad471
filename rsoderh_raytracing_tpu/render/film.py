"""Progressive accumulation film + display conversion.

The reference keeps two GPU textures — cumulative Rgba32Float light and a
display Rgba16Float mean — plus a sample counter, resetting on scene
change or resize (src/hdr.rs:66-148, src/state.rs:774-794). Here the film
is a device-resident (H, W, 3) float32 array and an integer counter; the
jitted ``accumulate`` fuses the add and the mean so one sample costs one
HBM round trip of the film.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rsoderh_raytracing_tpu.ops.tonemap import aces_tonemap, linear_to_srgb


@jax.jit
def _accumulate(cumulative, sample):
    return cumulative + sample


@jax.jit
def _display(cumulative, counts):
    mean = cumulative / jnp.maximum(counts, 1.0)[..., None]
    return aces_tonemap(mean)


@jax.jit
def _min_count(counts):
    return jnp.min(counts)


class Film:
    """Per-pixel radiance sums + per-pixel sample counts.

    Uniform accumulation (the reference's model) keeps all counts equal;
    the free-run wavefront adds a VARIABLE number of samples per pixel
    (render/wavefront.py:render_freerun), which the mean handles
    naturally. `sample_count` reports the minimum count — the
    convergence guarantee every pixel meets.
    """

    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height
        self.reset()

    def reset(self) -> None:
        self.cumulative = jnp.zeros((self.height, self.width, 3), jnp.float32)
        self.counts = jnp.zeros((self.height, self.width), jnp.uint32)
        self._uniform_count: int | None = 0
        # Device-side async min of counts (dispatched on mutation, read
        # lazily) so `sample_count` never issues a reduction at read time.
        self._min_dev = None
        self._min_cache: int | None = None

    def resize(self, width: int, height: int) -> None:
        self.width = width
        self.height = height
        self.reset()

    @property
    def sample_count(self) -> int:
        if self._uniform_count is not None:
            return self._uniform_count
        if self._min_cache is None:
            if self._min_dev is None:
                self._min_dev = _min_count(self.counts)
            self._min_cache = int(self._min_dev)
        return self._min_cache

    @property
    def is_uniform(self) -> bool:
        """True while every pixel holds the same sample count (no
        free-run accumulation since the last reset) — the precondition
        for exact-spp extension (renderer.render mode='exact')."""
        return self._uniform_count is not None

    def add_sample(self, sample) -> None:
        """Add ONE uniform sample for every pixel."""
        self.add_samples(sample, 1)

    def add_samples(self, summed, count: int) -> None:
        """Add the SUM of `count` uniform samples per pixel."""
        self.cumulative = _accumulate(self.cumulative, summed)
        self.counts = self.counts + jnp.uint32(count)
        if self._uniform_count is not None:
            self._uniform_count += count
        else:
            self._min_dev = _min_count(self.counts)
            self._min_cache = None

    def add_freerun(self, summed, counts) -> None:
        """Add a free-run result: per-pixel sums + per-pixel counts."""
        self.cumulative = _accumulate(self.cumulative, summed)
        self.counts = self.counts + counts.astype(jnp.uint32)
        self._uniform_count = None
        # Dispatch the min reduction NOW (async): by the time the host
        # reads sample_count the device has computed it alongside the
        # accumulate — no reduction-per-read sync on the CLI hot loop.
        self._min_dev = _min_count(self.counts)
        self._min_cache = None

    def mean_radiance(self) -> np.ndarray:
        counts = jnp.maximum(self.counts, 1.0)[..., None]
        return np.asarray(self.cumulative / counts)

    def tonemapped(self) -> np.ndarray:
        """ACES display image, linear [0,1]."""
        return np.asarray(
            _display(self.cumulative, self.counts.astype(jnp.float32))
        )

    def srgb8(self) -> np.ndarray:
        """8-bit sRGB image for PNG output."""
        linear = _display(self.cumulative, self.counts.astype(jnp.float32))
        srgb = linear_to_srgb(linear)
        return np.asarray(
            jnp.clip(srgb * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
        )

    def save_checkpoint(self, path: str, **extra) -> None:
        """Save the raw accumulation state (the reference never persists
        its accumulation buffer; this is a cheap capability win). `extra`
        arrays (e.g. the renderer's state hash, sharded stream positions)
        ride in the same .npz; loaders ignore keys they don't know."""
        np.savez(
            path,
            cumulative=np.asarray(self.cumulative),
            counts=np.asarray(self.counts),
            sample_count=self.sample_count,
            **extra,
        )

    def load_checkpoint(self, path: str) -> None:
        with np.load(path) as z:
            cumulative = z["cumulative"]
            if cumulative.shape != (self.height, self.width, 3):
                raise ValueError(
                    f"checkpoint shape {cumulative.shape} != film"
                    f" ({self.height}, {self.width}, 3)"
                )
            self.cumulative = jnp.asarray(cumulative)
            self._min_dev = None
            self._min_cache = None
            if "counts" in z.files:
                self.counts = jnp.asarray(z["counts"].astype(np.uint32))
                uniform = np.unique(z["counts"]).size == 1
                self._uniform_count = (
                    int(z["sample_count"]) if uniform else None
                )
            else:  # legacy scalar-count checkpoints
                count = int(z["sample_count"])
                self.counts = jnp.full(
                    (self.height, self.width), count, jnp.uint32
                )
                self._uniform_count = count
