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
def _display(cumulative, sample_count):
    mean = cumulative / sample_count
    return aces_tonemap(mean)


class Film:
    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height
        self.reset()

    def reset(self) -> None:
        self.cumulative = jnp.zeros((self.height, self.width, 3), jnp.float32)
        self.sample_count = 0

    def resize(self, width: int, height: int) -> None:
        self.width = width
        self.height = height
        self.reset()

    def add_sample(self, sample) -> None:
        self.cumulative = _accumulate(self.cumulative, sample)
        self.sample_count += 1

    def mean_radiance(self) -> np.ndarray:
        n = max(1, self.sample_count)
        return np.asarray(self.cumulative / n)

    def tonemapped(self) -> np.ndarray:
        """ACES display image, linear [0,1]."""
        n = max(1, self.sample_count)
        return np.asarray(_display(self.cumulative, jnp.float32(n)))

    def srgb8(self) -> np.ndarray:
        """8-bit sRGB image for PNG output."""
        n = max(1, self.sample_count)
        linear = _display(self.cumulative, jnp.float32(n))
        srgb = linear_to_srgb(linear)
        return np.asarray(
            jnp.clip(srgb * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
        )

    def save_checkpoint(self, path: str) -> None:
        """Save the raw accumulation state (the reference never persists
        its accumulation buffer; this is a cheap capability win)."""
        np.savez(
            path,
            cumulative=np.asarray(self.cumulative),
            sample_count=self.sample_count,
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
            self.sample_count = int(z["sample_count"])
