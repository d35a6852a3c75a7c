"""Field deinterlacing: weave / bob / yadif / bwdif.

TPU-native rebuild of pl_shader_deinterlace
(src/shaders/deinterlacing.c).  The reference emits a fragment/compute
shader with neighbor texture fetches (MIRROR addressing); here every
fetch becomes a mirror-padded shifted view, so the whole filter is pure
elementwise VPU math which XLA fuses into the surrounding pass.

Semantics preserved: only lines of the *opposite* field are
reconstructed (current-field lines pass through); yadif's edge-directed
spatial predictor + temporal clamping, bwdif's 3-tap/5-tap blended
interpolation with the exact spec coefficients.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["DeinterlaceAlgo", "DeinterlaceParams", "Field", "deinterlace"]


class DeinterlaceAlgo(enum.Enum):
    """Reference pl_deinterlace_algorithm (deinterlacing.h:93-131)."""
    WEAVE = "weave"   # no-op (show both fields)
    BOB = "bob"       # naive line doubling
    YADIF = "yadif"   # temporal/spatial adaptive
    BWDIF = "bwdif"   # yadif + w3fdif/cubic interpolation


class Field(enum.Enum):
    TOP = 0     # even lines (0, 2, 4...)
    BOTTOM = 1  # odd lines


@dataclass(frozen=True)
class DeinterlaceParams:
    algo: DeinterlaceAlgo = DeinterlaceAlgo.YADIF
    skip_spatial_check: bool = False

    def key(self):
        return (self.algo, self.skip_spatial_check)


def _pad(img, n):
    pad = [(0, 0)] * (img.ndim - 2) + [(n, n), (n, n)]
    return jnp.pad(img, pad, mode="reflect")


def _mk_get(img, n):
    h, w = img.shape[-2], img.shape[-1]
    p = _pad(img, n)

    def get(src_p, dx, dy):
        return src_p[..., n + dy:n + dy + h, n + dx:n + dx + w]
    return p, get


def _yadif_spatial(get, cur):
    """Edge-directed spatial predictor (reference spatial_predictor,
    deinterlacing.c:131-160), vectorized with sequential-min semantics
    preserved (each candidate only taken if it beats all previous)."""
    a = get(cur, -3, -1); b = get(cur, -2, -1); c = get(cur, -1, -1)
    d = get(cur, 0, -1); e = get(cur, 1, -1); f = get(cur, 2, -1)
    g = get(cur, 3, -1)
    h = get(cur, -3, 1); i = get(cur, -2, 1); j = get(cur, -1, 1)
    k = get(cur, 0, 1); l = get(cur, 1, 1); m = get(cur, 2, 1)
    n_ = get(cur, 3, 1)

    bias = 1 / 255.0
    pred = (d + k) / 2.0
    score = jnp.abs(c - j) + jnp.abs(d - k) + jnp.abs(e - l) - bias

    s1 = jnp.abs(b - k) + jnp.abs(c - l) + jnp.abs(d - m)
    take1 = s1 < score
    pred = jnp.where(take1, (c + l) / 2.0, pred)
    score1 = jnp.where(take1, s1, score)
    s2 = jnp.abs(a - l) + jnp.abs(b - m) + jnp.abs(c - n_)
    take2 = take1 & (s2 < score1)
    pred = jnp.where(take2, (b + m) / 2.0, pred)
    score2 = jnp.where(take2, s2, score1)

    s3 = jnp.abs(d - i) + jnp.abs(e - j) + jnp.abs(f - k)
    take3 = s3 < score2
    pred = jnp.where(take3, (e + j) / 2.0, pred)
    score3 = jnp.where(take3, s3, score2)
    s4 = jnp.abs(e - h) + jnp.abs(f - i) + jnp.abs(g - j)
    take4 = take3 & (s4 < score3)
    pred = jnp.where(take4, (f + i) / 2.0, pred)
    return pred


def deinterlace(cur, field: Field,
                params: Optional[DeinterlaceParams] = None,
                prev: Optional[jnp.ndarray] = None,
                next: Optional[jnp.ndarray] = None,
                first_field: Field = Field.TOP,
                row_offset=0):
    """Deinterlace (..., C, H, W): reconstruct lines of the opposite
    field from `cur` (+ neighbor frames for temporal algos).

    `field` — which field of `cur` is being displayed now.
    prev/next — neighboring frames (same shape), may be None.
    `row_offset` (traced ok) — global row index of row 0, so field
    parity stays correct when `cur` is a row-shard (or halo-extended
    block) of a larger frame.
    """
    p = params or DeinterlaceParams()
    algo = p.algo
    if algo == DeinterlaceAlgo.WEAVE:
        return cur

    h = cur.shape[-2]
    # mask of lines that belong to the current field (pass through)
    row_par = ((row_offset + jnp.arange(h)) % 2)[:, None]
    keep = (row_par == field.value)

    N = 4
    cur_p, get = _mk_get(cur, N)
    if algo == DeinterlaceAlgo.BOB:
        res = get(cur_p, 0, -1 if field == Field.TOP else 1)
        return jnp.where(keep, cur, res)

    prev_p = _pad(prev, N) if prev is not None else cur_p
    next_p = _pad(next, N) if next is not None else cur_p
    prev2_p = prev_p if field == first_field else cur_p
    next2_p = cur_p if field == first_field else next_p

    if algo == DeinterlaceAlgo.YADIF:
        pred = _yadif_spatial(get, cur_p)

        A = get(prev_p, 0, -1); B = get(prev_p, 0, 1)
        C = get(prev2_p, 0, -2); D = get(prev2_p, 0, 0)
        E = get(prev2_p, 0, 2)
        F = get(cur_p, 0, -1); G = get(cur_p, 0, 1)
        H = get(next2_p, 0, -2); I = get(next2_p, 0, 0)
        J = get(next2_p, 0, 2)
        K = get(next_p, 0, -1); L = get(next_p, 0, 1)

        p0 = (C + H) / 2.0
        p1 = F
        p2 = (D + I) / 2.0
        p3 = G
        p4 = (E + J) / 2.0
        tdiff0 = jnp.abs(D - I) / 2.0
        tdiff1 = (jnp.abs(A - F) + jnp.abs(B - G)) / 2.0
        tdiff2 = (jnp.abs(K - F) + jnp.abs(G - L)) / 2.0
        diff = jnp.maximum(tdiff0, jnp.maximum(tdiff1, tdiff2))
        if not p.skip_spatial_check:
            maxi = jnp.maximum(p2 - jnp.minimum(p3, p1),
                               jnp.minimum(p0 - p1, p4 - p3))
            mini = jnp.minimum(p2 - jnp.maximum(p3, p1),
                               jnp.maximum(p0 - p1, p4 - p3))
            diff = jnp.maximum(diff, jnp.maximum(mini, -maxi))
        res = jnp.clip(pred, p2 - diff, p2 + diff)
        return jnp.where(keep, cur, res)

    if algo == DeinterlaceAlgo.BWDIF:
        lf = (4309.0 / 8192.0, 213.0 / 8192.0)
        hf = (5570.0 / 8192.0, 3801.0 / 8192.0, 1016.0 / 8192.0)
        sp = (5077.0 / 8192.0, 981.0 / 8192.0)

        c0 = get(cur_p, 0, -3); c1 = get(cur_p, 0, -1)
        c2 = get(cur_p, 0, 1); c3 = get(cur_p, 0, 3)

        intra_only = (prev is None and field == first_field) or \
                     (next is None and field != first_field)
        if intra_only:
            res = sp[0] * (c1 + c2) - sp[1] * (c0 + c3)
            return jnp.where(keep, cur, jnp.clip(res, 0.0, None))

        pv0 = get(prev_p, 0, -1); pv1 = get(prev_p, 0, 1)
        nx0 = get(next_p, 0, -1); nx1 = get(next_p, 0, 1)
        P = [get(prev2_p, 0, o) for o in (-4, -2, 0, 2, 4)]
        Nn = [get(next2_p, 0, o) for o in (-4, -2, 0, 2, 4)]

        s = P[2] + Nn[2]
        d = s / 2.0
        c, e = c1, c2
        tdiff0 = jnp.abs(P[2] - Nn[2])
        tdiff1 = jnp.abs(pv0 - c) + jnp.abs(pv1 - e)
        tdiff2 = jnp.abs(nx0 - c) + jnp.abs(nx1 - e)
        diff = jnp.maximum(tdiff0, jnp.maximum(tdiff1, tdiff2)) / 2.0
        diff_zero = diff == 0.0

        bs = P[1] + Nn[1]
        fs = P[3] + Nn[3]
        b = bs / 2.0 - c
        f = fs / 2.0 - c
        dc = d - c
        de = d - e
        mmax = jnp.maximum(de, jnp.maximum(dc, jnp.minimum(b, f)))
        mmin = jnp.minimum(de, jnp.minimum(dc, jnp.maximum(b, f)))
        diff = jnp.maximum(diff, jnp.maximum(mmin, -mmax))

        single = sp[0] * (c + e) - sp[1] * (c0 + c3)
        all_ = (hf[0] * s - hf[1] * (bs + fs) +
                hf[2] * (P[0] + Nn[0] + P[4] + Nn[4])) / 4.0
        all_ = all_ + lf[0] * (c + e) - lf[1] * (c0 + c3)
        mask = jnp.abs(c - e) > tdiff0
        interpol = jnp.where(mask, all_, single)
        interpol = jnp.clip(interpol, d - diff, d + diff)
        res = jnp.where(diff_zero, d, interpol)
        return jnp.where(keep, cur, res)

    raise ValueError(algo)
