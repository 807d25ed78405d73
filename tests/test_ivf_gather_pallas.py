"""Pallas probed-cluster score kernel (ops/ivf_gather_pallas.py) —
interpret-mode numerics on CPU; the real-TPU win and exactness are
measured in benchmarks/ivf_pallas_probe.py (1.7x the XLA row-take at
1M/Q=256, 2.3e-5 vs the numpy oracle where XLA's fused gather+einsum
carries ~0.7% error)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from rankpo_tpu.ops.ivf_gather_pallas import probe_scores


def _setup(k_c=16, cap=16, d=128, q=5, p=3, dtype=jnp.float32, seed=0):
    kc, kq, kp = jax.random.split(jax.random.key(seed), 3)
    corpus = jax.random.normal(kc, (k_c * cap, d), jnp.float32).astype(dtype)
    queries = jax.random.normal(kq, (q, d), jnp.float32)
    probe = jax.random.randint(kp, (q, p), 0, k_c, jnp.int32)
    return corpus, probe, queries


def _oracle(corpus, probe, queries, cap):
    c = np.asarray(corpus, np.float32)
    pr = np.asarray(probe)
    qs = np.asarray(queries).astype(np.float32)
    q_n, p_n = pr.shape
    out = np.zeros((q_n, p_n, cap), np.float32)
    for qi in range(q_n):
        for pi in range(p_n):
            blk = c[pr[qi, pi] * cap : (pr[qi, pi] + 1) * cap]
            out[qi, pi] = blk @ qs[qi]
    return out


class TestProbeScoresInterpret:
    def test_fp32_matches_oracle(self):
        corpus, probe, queries = _setup(dtype=jnp.float32)
        got = np.asarray(
            probe_scores(corpus, probe, queries, cap=16, interpret=True)
        )
        np.testing.assert_allclose(
            got, _oracle(corpus, probe, queries, 16), atol=1e-5
        )

    def test_bf16_matches_bf16_oracle(self):
        corpus, probe, queries = _setup(dtype=jnp.bfloat16, seed=1)
        got = np.asarray(
            probe_scores(corpus, probe, queries, cap=16, interpret=True)
        )
        # oracle over the bf16-rounded ROWS; the query stays fp32 — the
        # kernel upcasts both operands and lets the unit round (interpret
        # mode: none; real MXU: bf16 inputs — matching the XLA path's
        # explicit bf16 cast, covered by the TPU-measured probe)
        ref = _oracle(corpus, probe, queries, 16)
        np.testing.assert_allclose(got, ref, atol=1e-2, rtol=1e-2)

    def test_repeated_and_boundary_probe_ids(self):
        corpus, probe, queries = _setup(k_c=8, cap=8, q=3, p=4, seed=2)
        probe = jnp.asarray([[0, 0, 7, 7], [7, 0, 7, 0], [3, 3, 3, 3]],
                            jnp.int32)
        got = np.asarray(
            probe_scores(corpus, probe, queries, cap=8, interpret=True)
        )
        np.testing.assert_allclose(
            got, _oracle(corpus, probe, queries, 8), atol=1e-5
        )

    def test_matches_xla_row_take_formulation(self):
        # the exact expression probe_block's fallback computes
        corpus, probe, queries = _setup(dtype=jnp.float32, seed=3)
        cap = 16
        q_n, p_n = probe.shape

        def xla(c, pr, qs):
            slots = (
                pr[:, :, None] * cap
                + lax.iota(jnp.int32, cap)[None, None, :]
            ).reshape(q_n, p_n * cap)
            rows = jnp.take(c, slots, axis=0)
            return jnp.einsum(
                "qd,qnd->qn", qs, rows,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(q_n, p_n, cap)

        ref = np.asarray(jax.jit(xla)(corpus, probe, queries))
        got = np.asarray(
            probe_scores(corpus, probe, queries, cap=cap, interpret=True)
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestPqAdcScoresInterpret:
    """Fused ADC kernel (ops/pq_adc_pallas.py) — interpret-mode numerics;
    the real-TPU win is measured in benchmarks/pq_decode_probe.py."""

    def _setup(self, k_c=16, cap=16, m=16, q=4, p=3, seed=0):
        rng = np.random.RandomState(seed)
        codes = rng.randint(0, 256, (k_c * cap, m)).astype(np.uint8)
        lut = rng.randn(q, m, 256).astype(np.float32)
        probe = rng.randint(0, k_c, (q, p)).astype(np.int32)
        return jnp.asarray(codes), jnp.asarray(probe), jnp.asarray(lut)

    @staticmethod
    def _oracle(codes, probe, lut, cap):
        c = np.asarray(codes)
        pr = np.asarray(probe)
        lt = np.asarray(lut)
        q_n, p_n = pr.shape
        m = c.shape[1]
        blocks = c.reshape(-1, cap, m)
        out = np.zeros((q_n, p_n, cap), np.float32)
        for qi in range(q_n):
            for pi in range(p_n):
                blk = blocks[pr[qi, pi]].astype(np.int64)  # [cap, m]
                # sum_m lut[m, code[c, m]]
                out[qi, pi] = lt[qi][np.arange(m)[None, :], blk].sum(axis=1)
        return out

    def test_matches_lut_sum_oracle(self):
        from rankpo_tpu.ops.pq_adc_pallas import pq_probe_scores

        codes, probe, lut = self._setup()
        got = np.asarray(
            pq_probe_scores(codes, probe, lut, cap=16, interpret=True)
        )
        ref = self._oracle(codes, probe, lut, 16)
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)

    def test_extreme_codes_and_repeated_probes(self):
        from rankpo_tpu.ops.pq_adc_pallas import pq_probe_scores

        codes, _, lut = self._setup(k_c=8, cap=8, m=8, q=2, p=4, seed=1)
        # force boundary code values (0 and 255 exercise the & 255 fixup)
        codes = codes.at[:4].set(0).at[4:8].set(255)
        probe = jnp.asarray([[0, 0, 7, 7], [7, 0, 7, 0]], jnp.int32)
        got = np.asarray(
            pq_probe_scores(codes, probe, lut, cap=8, interpret=True)
        )
        ref = self._oracle(codes, probe, lut, 8)
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)

    def test_mxu_reduce_matches_oracle_at_bf16(self):
        from rankpo_tpu.ops.pq_adc_pallas import pq_probe_scores

        codes, probe, lut = self._setup()
        got = np.asarray(
            pq_probe_scores(codes, probe, lut, cap=16, interpret=True,
                            mxu=True)
        )
        # the mxu path rounds LUT entries to bf16 before the matvec
        lut_bf16 = np.asarray(
            jnp.asarray(lut).astype(jnp.bfloat16).astype(jnp.float32)
        )
        ref = self._oracle(codes, probe, lut_bf16, 16)
        np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)

    def test_rejects_non_multiple_m(self):
        from rankpo_tpu.ops.pq_adc_pallas import pq_probe_scores

        codes, probe, lut = self._setup(m=12)
        with pytest.raises(ValueError, match="multiple"):
            pq_probe_scores(codes, probe, lut, cap=16, interpret=True)

    def test_multi_cap_block_grid(self, monkeypatch):
        # 10M-scale capacities split into cblk-row grid blocks (the whole-
        # cap block blew the scoped-VMEM stack, measured at cap=1592).
        # Force the tiling at test scale by shrinking the stack budget:
        # cap=128 with budget for 64 rows -> two cap-blocks per probe.
        from rankpo_tpu.ops import pq_adc_pallas

        monkeypatch.setattr(
            pq_adc_pallas, "_STACK_BUDGET", 64 * 16 * 256 * 2
        )
        assert pq_adc_pallas._cap_block(128, 16) == 64
        codes, probe, lut = self._setup(k_c=6, cap=128, m=16, q=3, p=2)
        got = np.asarray(
            pq_adc_pallas.pq_probe_scores(
                codes, probe, lut, cap=128, interpret=True
            )
        )
        ref = self._oracle(codes, probe, lut, 128)
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)

    def test_supported_gate(self):
        from rankpo_tpu.ops import pq_adc_pallas as adc

        assert adc.supported(320, 64)       # the 1M regime, single block
        assert adc.supported(1600, 64)      # 10M regime, 5 x 320 blocks
        assert not adc.supported(1592, 64)  # legacy x8-only capacity
        assert not adc.supported(320, 12)   # m not a multiple of _MCH
