"""Film accumulation.

Counterpart of `Film`/`FilmProgressive` (renderer/film.cpp:41-71): the
progressive film keeps a running average `(n*cur + v)/(n+1)` with the
sample count carried alongside (the reference stashes it in alpha; here
it is an explicit counter so the buffer stays a clean radiance image
and can be checkpointed).
"""
from __future__ import annotations

import jax.numpy as jnp


class Film:
    def __init__(self, height, width):
        self.height = height
        self.width = width
        self.clear()

    def clear(self):
        self.buf = jnp.zeros((self.height, self.width, 3), jnp.float32)
        self.count = 0

    def accumulate(self, img):
        n = self.count
        self.buf = (self.buf * n + img) / (n + 1)
        self.count = n + 1

    def image(self):
        return self.buf

    def state(self):
        """Checkpointable accumulation state (orbax-friendly pytree)."""
        return {"buf": self.buf, "count": jnp.int32(self.count)}

    def load_state(self, st):
        self.buf = st["buf"]
        self.count = int(st["count"])


def tonemap_gamma(img, gamma=2.2):
    """Simple gamma post op (display/gamma.h:9 role)."""
    return jnp.clip(img, 0.0, 1.0) ** (1.0 / gamma)


def to_srgb_u8(img):
    import numpy as np

    x = np.asarray(tonemap_gamma(img))
    return (x * 255.0 + 0.5).astype("uint8")
