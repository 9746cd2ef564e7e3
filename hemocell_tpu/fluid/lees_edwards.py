"""Lees-Edwards sheared periodic boundary (z-axis).

TPU-native equivalent of the reference's Lees-Edwards data processors
(helper/leesEdwardsBC.h:57-383, used by cases/leesEdwards): the z-periodic
wrap is combined with a time-accumulated x-displacement and a Galilean
velocity offset, so an unbounded uniform shear du_x/dz can be simulated in a
fully periodic box.

Implementation: after the regular periodic collide+stream, the populations
that crossed the z-boundary are corrected:
  * crossing populations are re-sampled from the donor plane with a linear
    x-interpolation at the fractional displacement (same interpolation the
    reference uses);
  * their equilibrium part is shifted to the moving frame:
      f_q  +=  f_q^eq(rho, u -/+ U) - f_q^eq(rho, u)
    with U = (shear_rate * Lz, 0, 0) the relative frame velocity.

State: the accumulated displacement (in lu) is carried by the caller
(displacement_t = shear_rate * Lz * t, wrapped mod Lx).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import d3q19
from .lbm import collide, equilibrium, macroscopic


def _plane_eq_shift(f_plane, du, dtype):
    """feq(rho,u+du) - feq(rho,u) for one z-plane [19, X, Y]."""
    c = jnp.asarray(d3q19.C, dtype)
    rho = 1.0 + jnp.sum(f_plane, axis=0)  # deviation storage (lbm.py)
    mom = jnp.tensordot(c.T, f_plane, axes=([1], [0]))
    u = mom / rho[None]
    u_shift = u + jnp.asarray(du, dtype)[:, None, None]
    # equilibrium() expects [3, ...]
    return equilibrium(rho, u_shift) - equilibrium(rho, u)


def _le_correct(top, bot, displacement, shear_velocity, dtype):
    """LE correction of the two post-collision wrap planes [19, X, Y].

    Our z=0 receives upward-crossing populations from the top plane of the
    image BELOW (displaced -d, moving -U relative to us): sample the top
    plane at x + d and shift its equilibrium by -U.  Symmetrically, z=Z-1
    receives from the bottom plane of the image ABOVE (+d, +U)."""
    X = top.shape[1]
    d = jnp.mod(displacement, X)
    i0 = jnp.floor(d).astype(jnp.int32)
    frac = (d - jnp.floor(d)).astype(dtype)

    def sample(plane, sign):
        """g(x) = plane(x + sign*d), periodic linear interpolation."""
        a = jnp.roll(plane, -sign * i0, axis=1)
        b = jnp.roll(plane, -sign * (i0 + 1), axis=1)
        return (1.0 - frac) * a + frac * b

    top_c = sample(top, +1)
    top_c = top_c + _plane_eq_shift(top_c, (-shear_velocity, 0.0, 0.0), dtype)
    bot_c = sample(bot, -1)
    bot_c = bot_c + _plane_eq_shift(bot_c, (+shear_velocity, 0.0, 0.0), dtype)
    return top_c, bot_c


def le_stream_collide(f, force, omega, displacement, shear_velocity):
    """One LBM step with Lees-Edwards wrapping across the z faces.

    displacement: accumulated x-offset of the image above z=Lz-1 (traced
    scalar, in lu, any real value; wrapped here).
    shear_velocity: relative x-velocity of that image (= shear_rate * Lz).
    """
    dtype = f.dtype
    Q, X, Y, Z = f.shape
    flags = jnp.zeros((X, Y, Z), jnp.uint8)
    post = collide(f, force, omega, flags)

    top_c, bot_c = _le_correct(
        post[:, :, :, Z - 1], post[:, :, :, 0],
        displacement, shear_velocity, dtype,
    )
    return stream_with_planes(post, jnp.concatenate([top_c, bot_c], axis=0))


def stream_with_planes(post, planes):
    """Streaming with pre-corrected z-wrap planes substituted.

    post: [19, X*, Y, Z] post-collision populations (any x extent — the
    shard_map path passes an x-extended local block, whose body rows come
    out correct after the periodic x-roll + slice); planes: [38, X*, Y]
    corrected planes (top 0:19, bottom 19:38) aligned with post's x rows.
    """
    _, _, _, Z = post.shape
    outs = []
    for q in range(19):
        cx, cy, cz = (int(v) for v in d3q19.C[q])
        fq = post[q]
        if cz == 1:
            fq = fq.at[:, :, Z - 1].set(planes[q])
        elif cz == -1:
            fq = fq.at[:, :, 0].set(planes[19 + q])
        if cx or cy or cz:
            fq = jnp.roll(fq, shift=(cx, cy, cz), axis=(0, 1, 2))
        outs.append(fq)
    return jnp.stack(outs, axis=0)


def _corrected_planes(f, force, omega, displacement, shear_velocity):
    """Post-collision z-boundary planes with the LE correction applied,
    packed [2*19, X, Y] (top 0:19, bottom 19:38) for the Pallas kernel.

    Collision is node-local, so colliding just the two boundary planes
    (out of Z) costs ~2/Z of a full collide."""
    dtype = f.dtype
    Q, X, Y, Z = f.shape
    flags2 = jnp.zeros((X, Y, 2), jnp.uint8)
    f2 = jnp.stack([f[:, :, :, Z - 1], f[:, :, :, 0]], axis=-1)
    force2 = jnp.stack(
        [force[:, :, :, Z - 1], force[:, :, :, 0]], axis=-1
    )
    post2 = collide(f2, force2, omega, flags2)
    return corrected_planes_from_pair(
        post2[:, :, :, 0], post2[:, :, :, 1], displacement, shear_velocity
    )


def corrected_planes_from_pair(post_top, post_bot, displacement,
                               shear_velocity):
    """[19, X, Y] post-collision top (z=Z-1) / bottom (z=0) planes ->
    packed corrected planes [38, X, Y].  The displaced x-sample spans the
    FULL domain width, so the shard_map path collides its local plane
    pair, all_gathers it along the x mesh axis, and calls this on the
    gathered planes (parallel/sharded_step.py)."""
    dtype = post_top.dtype
    top_c, bot_c = _le_correct(post_top, post_bot, displacement,
                               shear_velocity, dtype)
    return jnp.concatenate([top_c, bot_c], axis=0)


def le_stream_collide_pallas(f, force, omega, displacement, shear_velocity,
                             interpret=None):
    """Fused-kernel LE step: the two corrected wrap planes are computed in
    jnp (2/Z of a collide) and substituted inside the Pallas stream-collide
    (pallas_lbm._kernel le_sub) — the full-field collide+stream runs at the
    fused-kernel rate instead of the 19-roll jnp path."""
    from .pallas_lbm import _pick_tx, stream_collide_pallas

    Q, X, Y, Z = f.shape
    # jnp fallback when planes don't fit VMEM, or with a spatially varying
    # omega (interior viscosity): the fused kernel takes a scalar omega
    # only, while le_stream_collide broadcasts an [X,Y,Z] field fine.
    if _pick_tx(X, Y, Z) == 0 or jnp.ndim(omega) != 0:
        return le_stream_collide(f, force, omega, displacement,
                                 shear_velocity)
    planes = _corrected_planes(f, force, omega, displacement, shear_velocity)
    # flags=None: the LE shear box is all-fluid by construction, so the
    # kernel skips the flags operand (one fewer HBM channel + its halos)
    return stream_collide_pallas(
        f, force, omega, None,
        le_planes=planes, interpret=interpret,
    )


def le_parameters(shear_rate_lbm: float, Z: int):
    """Relative image velocity and per-step displacement increment."""
    u_rel = shear_rate_lbm * Z
    return u_rel, u_rel  # displacement grows by u_rel per step
