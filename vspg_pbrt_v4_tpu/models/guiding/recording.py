"""Path-segment recording + radiance back-propagation for guiding training.

Wavefront analog of OpenPGL's PathSegmentStorage / PropagateSamples and the
reference's recording helpers (guiding.h:682-832: per-vertex position, wi,
scattering weight, direct light, emission, pdf, isVolume, distance). Each
wave records its first D_MAX scattering vertices into fixed (R, D, ...)
slots; after the wave a reverse ``lax.scan`` over the depth axis turns the
per-vertex contributions into incoming-radiance training samples — the
replacement for the per-path backward walk PropagateSamples does on CPU.

The incoming radiance along the edge leaving vertex k is
    Li_k = emission_k + direct_{k+1} + w_{k+1} * Li_{k+1}
where emission_k = emitted light seen by the ray leaving k (area light /
envmap hit, MIS-weighted), direct_{k+1} = NEE estimate scattered at the next
vertex, and w_{k+1} its scattering weight (f cos / pdf or phase weight).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .field import TrainBatch


class SegmentRecord(NamedTuple):
    """(R, D, ...) recording buffers carried through the bounce loop."""

    pos: jnp.ndarray  # (R,D,3) vertex position
    wi: jnp.ndarray  # (R,D,3) sampled outgoing direction at vertex
    scatter_w: jnp.ndarray  # (R,D,3) f*cos/pdf (or phase weight) at vertex
    direct: jnp.ndarray  # (R,D,3) NEE contribution scattered at vertex
    emission: jnp.ndarray  # (R,D,3) MIS-weighted emission seen along edge k
    pdf: jnp.ndarray  # (R,D) sampling pdf of wi
    distance: jnp.ndarray  # (R,D) edge length to next vertex (1e6 escaped)
    is_volume: jnp.ndarray  # (R,D) bool vertex type
    valid: jnp.ndarray  # (R,D)
    count: jnp.ndarray  # (R,) vertices recorded

    @staticmethod
    def make(R, D, like):
        """like: any varying (R,) array to seed vma-compatible zeros."""
        z = jnp.zeros((R, D)) + 0.0 * like[:, None]
        z3 = z[..., None] * jnp.zeros(3)
        f = z > 1.0
        return SegmentRecord(z3, z3, z3, z3, z3, z, z, f, f,
                             jnp.zeros_like(like).astype(jnp.int32))


def record_vertex(rec: SegmentRecord, mask, pos, wi, scatter_w, pdf,
                  is_volume):
    """Open a new vertex slot for lanes in `mask` (called at a real scatter
    event, after direction sampling). Returns updated record."""
    R = rec.count.shape[0]
    lanes = jnp.arange(R)
    slot = jnp.minimum(rec.count, rec.pos.shape[1] - 1)
    in_range = mask & (rec.count < rec.pos.shape[1])

    def put(buf, val):
        old = buf[lanes, slot]
        m = in_range
        if val.ndim > m.ndim:
            m = m[..., None]
        return buf.at[lanes, slot].set(jnp.where(m, val, old))

    # close the previous vertex's edge with the actual vertex-to-vertex dist
    prev_slot = jnp.clip(rec.count - 1, 0, rec.pos.shape[1] - 1)
    has_prev = in_range & (rec.count > 0)
    prev_pos = rec.pos[lanes, prev_slot]
    edge = jnp.sqrt(jnp.maximum(jnp.sum((pos - prev_pos) ** 2, -1), 0.0))
    old_d = rec.distance[lanes, prev_slot]
    rec = rec._replace(distance=rec.distance.at[lanes, prev_slot].set(
        jnp.where(has_prev, edge, old_d)))

    rec = rec._replace(
        pos=put(rec.pos, pos),
        wi=put(rec.wi, wi),
        scatter_w=put(rec.scatter_w, scatter_w),
        pdf=put(rec.pdf, pdf),
        is_volume=put(rec.is_volume, is_volume),
        valid=put(rec.valid, jnp.ones_like(mask)),
        count=jnp.where(in_range, rec.count + 1, rec.count),
    )
    return rec


def record_direct(rec: SegmentRecord, mask, contribution):
    """Attach an NEE contribution (without beta prefix) to the most recent
    vertex (guiding.h addScatteredDirectLight)."""
    R = rec.count.shape[0]
    lanes = jnp.arange(R)
    slot = jnp.clip(rec.count - 1, 0, rec.pos.shape[1] - 1)
    ok = mask & (rec.count > 0) & (rec.count <= rec.pos.shape[1])
    old = rec.direct[lanes, slot]
    new = jnp.where(ok[..., None], old + contribution, old)
    return rec._replace(direct=rec.direct.at[lanes, slot].set(new))


def record_emission(rec: SegmentRecord, mask, contribution, distance):
    """Attach MIS-weighted emission seen along the edge leaving the most
    recent vertex (addSurfaceEmission / addInfiniteLightEmission)."""
    R = rec.count.shape[0]
    lanes = jnp.arange(R)
    slot = jnp.clip(rec.count - 1, 0, rec.pos.shape[1] - 1)
    ok = mask & (rec.count > 0) & (rec.count <= rec.pos.shape[1])
    old_e = rec.emission[lanes, slot]
    new_e = jnp.where(ok[..., None], old_e + contribution, old_e)
    old_d = rec.distance[lanes, slot]
    new_d = jnp.where(ok, jnp.maximum(old_d, distance), old_d)
    return rec._replace(
        emission=rec.emission.at[lanes, slot].set(new_e),
        distance=rec.distance.at[lanes, slot].set(new_d),
    )


def record_edge_distance(rec: SegmentRecord, mask, distance):
    """Set the edge length from the most recent vertex to the next event."""
    R = rec.count.shape[0]
    lanes = jnp.arange(R)
    slot = jnp.clip(rec.count - 1, 0, rec.pos.shape[1] - 1)
    ok = mask & (rec.count > 0) & (rec.count <= rec.pos.shape[1])
    old = rec.distance[lanes, slot]
    return rec._replace(
        distance=rec.distance.at[lanes, slot].set(jnp.where(ok, distance, old))
    )


def propagate(rec: SegmentRecord) -> TrainBatch:
    """Reverse-scan the recorded vertices into training samples
    (PathSegmentStorage::PropagateSamples analog).

    Returns a TrainBatch of N = R*D flattened samples (invalid slots have
    valid=False and weight 0).
    """
    R, D = rec.pdf.shape

    def lum(x):
        return jnp.mean(x, axis=-1)

    # Li along edge k, computed backwards:
    #   Li_k = emission_k + direct_{k+1} + scatter_w_{k+1} * Li_{k+1}
    def step(carry, xs):
        li_next = carry  # (R,3) Li_{k+1}
        emission_k, direct_k1, w_k1, valid_k1 = xs
        li_k = emission_k + jnp.where(
            valid_k1[..., None], direct_k1 + w_k1 * li_next, 0.0
        )
        return li_k, li_k

    # build shifted (k+1) arrays
    direct_next = jnp.concatenate([rec.direct[:, 1:], jnp.zeros((R, 1, 3))], 1)
    w_next = jnp.concatenate([rec.scatter_w[:, 1:], jnp.zeros((R, 1, 3))], 1)
    valid_next = jnp.concatenate([rec.valid[:, 1:], jnp.zeros((R, 1), bool)], 1)
    is_vol_next = jnp.concatenate([rec.is_volume[:, 1:], jnp.zeros((R, 1), bool)], 1)

    xs = (
        jnp.moveaxis(rec.emission, 1, 0),
        jnp.moveaxis(direct_next, 1, 0),
        jnp.moveaxis(w_next, 1, 0),
        jnp.moveaxis(valid_next, 1, 0),
    )
    _, li_rev = jax.lax.scan(step, jnp.zeros((R, 3)), xs, reverse=True)
    li = jnp.moveaxis(li_rev, 0, 1)  # (R,D,3) incoming radiance along edge k

    # VSP observation: partition Li_k by the *next* event type (the paper's
    # contribution-weighted "does the ray scatter in the volume first").
    # Emission seen along the edge is surface light; the scattered part
    # belongs to whichever vertex type k+1 is.
    li_lum = lum(li)
    scatter_part = jnp.where(valid_next, li_lum - lum(rec.emission), 0.0)
    scatter_part = jnp.maximum(scatter_part, 0.0)
    next_vol = valid_next & is_vol_next
    c_vol = jnp.where(next_vol, scatter_part, 0.0)
    c_surf = jnp.maximum(li_lum - c_vol, 0.0)

    # EM weight = Li / pdf(wi): the fitted density tracks *incident
    # radiance*, not radiance x sampling-pdf (OpenPGL SampleData.weight)
    weight = li_lum / jnp.maximum(rec.pdf, 1e-6)
    valid = rec.valid & (weight > 0) & jnp.isfinite(weight)

    flat = lambda x: x.reshape((R * D,) + x.shape[2:])
    return TrainBatch(
        pos=flat(rec.pos),
        wi=flat(rec.wi),
        weight=flat(weight),
        radiance=flat(li),
        distance=flat(jnp.where(rec.distance > 0, rec.distance, 1e6)),
        is_volume=flat(rec.is_volume),
        c_vol=flat(c_vol),
        c_surf=flat(c_surf),
        valid=flat(valid),
    )
