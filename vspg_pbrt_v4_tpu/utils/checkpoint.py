"""Render checkpointing (SURVEY.md §5: cache persistence + partial images).

The reference persists the guiding field, ISGB and Tr buffers plus per-wave
partial images (guidedvolpathvspgintegrator.cpp:117-217, cpu/integrators.cpp:
243-261). Here the film accumulation state itself is also checkpointable, so
an interrupted progressive render resumes exactly: rgb/weight/splat sums +
spp done + seed are one npz. Guiding caches use field.save_field /
isgb.save_isgb alongside.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.film import FilmState


def save_render_state(path, film_state: FilmState, spp_done: int, seed: int):
    np.savez(
        path,
        rgb_sum=np.asarray(film_state.rgb_sum),
        weight_sum=np.asarray(film_state.weight_sum),
        splat_sum=np.asarray(film_state.splat_sum),
        spp_done=spp_done,
        seed=seed,
    )


def load_render_state(path):
    d = np.load(path)
    state = FilmState(
        jnp.asarray(d["rgb_sum"]),
        jnp.asarray(d["weight_sum"]),
        jnp.asarray(d["splat_sum"]),
    )
    return state, int(d["spp_done"]), int(d["seed"])
