"""Multi-chip sharding on the 8-device virtual CPU mesh: sharded results must
equal single-chip results bit-exactly."""

import random

import jax
import jax.numpy as jnp
import numpy as np

import conftest  # noqa: F401
import pytest

# 8-device SPMD CPU compiles take minutes each - heavy tier (fast-tier
# coverage: the driver's dryrun_multichip compiles+runs the same paths)
pytestmark = pytest.mark.heavy
from bls12_381_tpu import hostmath as hm
from bls12_381_tpu.curves import g1
from bls12_381_tpu.fields import fp, fr, tower as tw
from bls12_381_tpu.ops import msm, ntt
from bls12_381_tpu.parallel import (
    mesh as mesh_mod,
    msm_g1_sharded,
    ntt_sharded,
    pairing_sharded,
)
from bls12_381_tpu.params import Q, G1_GEN, G2_GEN

random.seed(17)


def test_eight_virtual_devices():
    assert len(jax.devices("cpu")) == 8


def test_msm_sharded_matches_local(cpu_mesh_8):
    mesh = cpu_mesh_8
    n = 32
    ks = [random.randrange(Q) for _ in range(n)]
    host_pts = [hm.g1_mul(G1_GEN, i + 1) for i in range(n)]
    pts = g1.from_affine(
        (
            fp.from_ints([p[0] for p in host_pts]),
            fp.from_ints([p[1] for p in host_pts]),
            jnp.zeros((n,), dtype=bool),
        )
    )
    scalars = fr.from_ints(ks)
    local = msm.msm_g1(pts, scalars, c=4)
    sharded = msm_g1_sharded(mesh, pts, scalars, c=4)
    aff_l = g1.to_affine(local)
    aff_s = g1.to_affine(sharded)
    assert int(fp.to_ints(aff_l[0])) == int(fp.to_ints(aff_s[0]))
    assert int(fp.to_ints(aff_l[1])) == int(fp.to_ints(aff_s[1]))


def test_msm_g2_sharded_matches_local(cpu_mesh_8):
    from bls12_381_tpu.curves import g2
    from bls12_381_tpu.parallel import msm_g2_sharded

    mesh = cpu_mesh_8
    n = 16
    ks = [random.randrange(Q) for _ in range(n)]
    host_pts = [hm.g2_mul(G2_GEN, i + 1) for i in range(n)]
    pts = g2.from_affine(
        (
            tw.fp2_from_ints([p[0] for p in host_pts]),
            tw.fp2_from_ints([p[1] for p in host_pts]),
            jnp.zeros((n,), dtype=bool),
        )
    )
    scalars = fr.from_ints(ks)
    local = msm.msm_g2(pts, scalars, c=4)
    sharded = msm_g2_sharded(mesh, pts, scalars, c=4)
    aff_l = g2.to_affine(local)
    aff_s = g2.to_affine(sharded)
    for cl, cs in zip(jax.tree.leaves(aff_l), jax.tree.leaves(aff_s)):
        assert np.array_equal(np.asarray(cl), np.asarray(cs))


def test_ntt_sharded_matches_local(cpu_mesh_8):
    mesh = cpu_mesh_8
    # n matches __graft_entry__.dryrun_multichip(8) so the sharded-NTT graph
    # is shared with (and cached for) the driver's dry run
    n = 256
    coeffs = [random.randrange(Q) for _ in range(n)]
    enc = fr.from_ints(coeffs)
    local = ntt.ntt(enc)
    sharded = ntt_sharded(mesh, enc)
    assert [int(v) for v in fr.to_ints(local)] == [
        int(v) for v in fr.to_ints(sharded)
    ]
    # inverse roundtrip through the sharded path
    back = ntt_sharded(mesh, sharded, inverse=True)
    assert [int(v) for v in fr.to_ints(back)] == coeffs


def test_pairing_sharded_aggregate(cpu_mesh_8):
    mesh = cpu_mesh_8
    b = 8
    phs = [hm.g1_mul(G1_GEN, i + 1) for i in range(b)]
    qhs = [hm.g2_mul(G2_GEN, 2 * i + 1) for i in range(b)]
    p_aff = (
        fp.from_ints([p[0] for p in phs]),
        fp.from_ints([p[1] for p in phs]),
        jnp.zeros((b,), dtype=bool),
    )
    q_aff = (
        tw.fp2_from_ints([q[0] for q in qhs]),
        tw.fp2_from_ints([q[1] for q in qhs]),
        jnp.zeros((b,), dtype=bool),
    )
    # final_exp=False: the cross-chip semantics under test are shard +
    # all_gather + product; the (single-chip) final exponentiation is covered
    # by test_pairing and would dominate this test's CPU compile time.
    # Raw Miller values carry projective line-scaling factors that only the
    # final exponentiation kills, so the reference here is the DEVICE
    # single-chip multi_miller_loop (bit-exact across platforms), not the
    # host oracle.
    from bls12_381_tpu import pairing as pr

    agg = pairing_sharded(mesh, p_aff, q_aff, aggregate=True, final_exp=False)
    with jax.default_device(jax.devices("cpu")[0]):
        ref = pr.multi_miller_loop(p_aff, pr.prepare_g2(q_aff))
    got = np.stack([np.asarray(c) for c6 in agg for c2 in c6 for c in c2])
    exp = np.stack([np.asarray(c) for c6 in ref for c2 in c6 for c in c2])
    assert np.array_equal(got, exp)


def _pairing_batch_inputs(b):
    phs = [hm.g1_mul(G1_GEN, i + 1) for i in range(b)]
    qhs = [hm.g2_mul(G2_GEN, 2 * i + 1) for i in range(b)]
    p_aff = (
        fp.from_ints([p[0] for p in phs]),
        fp.from_ints([p[1] for p in phs]),
        jnp.zeros((b,), dtype=bool),
    )
    q_aff = (
        tw.fp2_from_ints([q[0] for q in qhs]),
        tw.fp2_from_ints([q[1] for q in qhs]),
        jnp.zeros((b,), dtype=bool),
    )
    return phs, qhs, p_aff, q_aff


def _dec12_scalar(res):
    got = tw.fp12_to_host(res)
    return tuple(
        tuple((int(c2[0]), int(c2[1])) for c2 in c6) for c6 in got
    )


def _dec12_at(res, i):
    got = tw.fp12_to_host(res)
    return tuple(
        tuple((int(c2[0][i]), int(c2[1][i])) for c2 in c6) for c6 in got
    )


def test_pairing_sharded_aggregate_final_exp(cpu_mesh_8):
    """The PRODUCTION aggregate path (final_exp=True, the default) through
    shard_map, vs the host oracle's product of pairings."""
    mesh = cpu_mesh_8
    b = 8
    phs, qhs, p_aff, q_aff = _pairing_batch_inputs(b)
    agg = pairing_sharded(mesh, p_aff, q_aff, aggregate=True, final_exp=True)
    exp = hm.pairing(phs[0], qhs[0])
    for ph, qh in zip(phs[1:], qhs[1:]):
        exp = hm.fp12_mul(exp, hm.pairing(ph, qh))
    assert _dec12_scalar(agg) == exp


def test_pairing_sharded_elementwise(cpu_mesh_8):
    """aggregate=False: element-wise sharded pairings (incl. final exp) must
    equal the host oracle pairing lane by lane.

    Cache writes are suppressed: XLA's executable.serialize() segfaults on
    this executable (the largest 8-device SPMD graph in the suite)."""
    from bls12_381_tpu import config

    mesh = cpu_mesh_8
    b = 8
    phs, qhs, p_aff, q_aff = _pairing_batch_inputs(b)
    with config.no_cache_write():
        out = pairing_sharded(mesh, p_aff, q_aff, aggregate=False)
    for i in range(b):
        assert _dec12_at(out, i) == hm.pairing(phs[i], qhs[i]), i


def test_msm_sharded_2d_mesh(cpu_mesh_2x4):
    """Same MSM through the 2-D ("host", "x") mesh: hierarchical ICI-then-
    DCN reduction must match the local result."""
    mesh = cpu_mesh_2x4
    n = 32
    ks = [random.randrange(Q) for _ in range(n)]
    host_pts = [hm.g1_mul(G1_GEN, i + 1) for i in range(n)]
    pts = g1.from_affine(
        (
            fp.from_ints([p[0] for p in host_pts]),
            fp.from_ints([p[1] for p in host_pts]),
            jnp.zeros((n,), dtype=bool),
        )
    )
    scalars = fr.from_ints(ks)
    local = msm.msm_g1(pts, scalars, c=4)
    sharded = msm_g1_sharded(mesh, pts, scalars, c=4)
    aff_l = g1.to_affine(local)
    aff_s = g1.to_affine(sharded)
    assert int(fp.to_ints(aff_l[0])) == int(fp.to_ints(aff_s[0]))
    assert int(fp.to_ints(aff_l[1])) == int(fp.to_ints(aff_s[1]))


def test_ntt_sharded_2d_mesh(cpu_mesh_2x4):
    mesh = cpu_mesh_2x4
    n = 256
    coeffs = [random.randrange(Q) for _ in range(n)]
    enc = fr.from_ints(coeffs)
    local = ntt.ntt(enc)
    sharded = ntt_sharded(mesh, enc)
    assert [int(v) for v in fr.to_ints(local)] == [
        int(v) for v in fr.to_ints(sharded)
    ]
