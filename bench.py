"""Headline benchmark: exact brute-force top-k QPS vs CPU baseline.

Targets BASELINE.json's north star: the FlatIP engine (replacing FAISS
IndexFlatIP, reference src/utils.py:38-80) must deliver >=10x FAISS-CPU QPS at
equal index memory. FAISS is not installed in this image, so the CPU baseline
is the faster of a numpy BLAS matmul + argpartition search and a C++
multithreaded heap top-k — the same exact algorithm class as FAISS flat.

Metric definition (documented in the JSON as ``metric_definition``): the
headline ``value`` is EQUAL-FOOTING QPS — measured on-device engine time plus
a host PCIe transfer model (queries H2D + results D2H at ``pcie_gbps``) for
the same workload. Rationale: this dev harness reaches the TPU through a
remote tunnel whose bandwidth swings 85→8 MB/s within a day (measured,
docs/BENCHMARKS.md); at 8 MB/s the 16.8 MB query block alone caps e2e at
~2k QPS no matter how fast the chip is. FAISS-CPU pays zero transfer
in-process, so the raw tunnel number penalizes only the TPU side with a
harness artifact a production v5e host (PCIe, GB/s) never pays. Both raw
numbers are still reported: ``tunnel_e2e_qps`` (best of samples spread over
the full bench runtime, i.e. across tunnel-bandwidth regimes) and
``on_device_qps`` (pure engine). The fp32 oracle gate stays a hard
precondition for reporting anything.

Also reports the 1M-passage engine numbers (``qps_1m_exact``,
``qps_1m_int8``) — BASELINE.json's pod-serving regime is multi-million
passages. The 1M corpus is generated ON DEVICE (a 4 GB H2D through the
tunnel is pure harness tax); its oracle is host-side: the fp32 score matrix
for a query probe is fetched and argsorted on the host, validating
everything downstream of the matmul (blockmax two-pass, chunk merge,
offsets, tie order). The matmul itself is host-oracle-validated at 100k.

``qps_1m_pq_opq`` / ``recall_1m_pq_opq`` cover the approximate tier: the
IVF + residual-PQ index with the trained OPQ rotation (the 100M-rows-on-
one-chip codec, 64 B/row vs 4 KB fp32) on a CLUSTERED power-law corpus —
the regime an inverted file exists for; the isotropic corpus above is
IVF's documented worst case and would measure nothing but that. Recall is
vs that corpus's own fp32 oracle probe; data shape is labeled in the key's
definition below.

Prints ONE json line.
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import time

import numpy as np


N_CORPUS = 100_000
DIM = 1024
N_QUERIES = 4096
K = 100
BATCH = 4096  # engine-only measurement: one dispatch, dense path
# e2e dispatch granularity: FlatIPIndex.search dispatches batches async with
# per-chunk D2H, so chunking pipelines H2D/compute/D2H (8 x 512 measured best
# through the remote tunnel, docs/BENCHMARKS.md)
E2E_BATCH = 512
CPU_QUERY_SAMPLE = 64  # measure CPU on a subset, scale QPS

N_CORPUS_1M = 1_000_000
BATCH_1M = 1024
ORACLE_PROBE_1M = 8  # host-oracle queries at 1M (8 x 1M fp32 = 32 MB D2H)

# approximate-tier (IVF+PQ/OPQ) knobs — module-level so the contract test
# can shrink them
PQ_1M_CLUSTERS = 4096
PQ_1M_NPROBE = 8
PQ_1M_M = 64
PQ_1M_BLOBS = 2048

# Equal-footing host transfer model: conservative effective PCIe bandwidth
# for a production TPU host (v5e attaches over PCIe Gen3 x16, ~16 GB/s
# theoretical; 8 GB/s leaves 2x margin for protocol + pinning overhead).
PCIE_GBPS = 8.0


def _make_data():
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N_CORPUS, DIM), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = rng.standard_normal((N_QUERIES, DIM), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
    return corpus, queries


def _cpu_qps(corpus: np.ndarray, queries: np.ndarray) -> float:
    """Best of: C++ multithreaded heap top-k (FAISS-flat class) and numpy BLAS
    matmul + argpartition. Take the faster as the honest baseline."""
    sub = queries[:CPU_QUERY_SAMPLE]

    def numpy_path():
        scores = sub @ corpus.T
        part = np.argpartition(-scores, kth=K - 1, axis=1)[:, :K]
        ps = np.take_along_axis(scores, part, axis=1)
        order = np.argsort(-ps, axis=1, kind="stable")
        np.take_along_axis(part, order, axis=1)

    # best-of-3 per path: the honest baseline is the CPU at its FASTEST
    # (thread scheduling makes single-shot numbers swing several x)
    qps_numpy = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        numpy_path()
        qps_numpy = max(qps_numpy, len(sub) / (time.perf_counter() - t0))

    qps_native = 0.0
    try:
        from rankpo_tpu.native import native_topk_ip

        native_topk_ip(corpus[:1000], sub[:4], K)  # warm build
        for _ in range(3):
            t0 = time.perf_counter()
            native_topk_ip(corpus, sub, K)
            qps_native = max(qps_native, len(sub) / (time.perf_counter() - t0))
    except Exception:
        pass
    return max(qps_numpy, qps_native)


def _oracle_gate(index, corpus, queries):
    """Hard precondition: engine results must match FAISS IndexFlatIP
    semantics (fp32 scores, lowest-index ties) against the numpy oracle."""
    from rankpo_tpu.index.flat import numpy_search

    s, i = index.search(queries[:E2E_BATCH], k=K, batch_size=E2E_BATCH)
    assert np.all(np.isfinite(s))
    ref_s, ref_i = numpy_search(corpus, queries[:64], K)
    mismatch = i[:64] != ref_i
    n_bad = int(mismatch.sum())
    # fp32-faithful (bf16x3) matmul reorders accumulation vs numpy, so a
    # handful of exact near-ties may swap (documented residual: ~2e-7 score
    # error, docs/BENCHMARKS.md). Divergences must BE near-ties — the scores
    # at every mismatched position must agree to fp32 noise — and rare.
    if n_bad > 64 * K // 200 or not np.allclose(
        s[:64][mismatch], ref_s[mismatch], atol=2e-5
    ):
        raise AssertionError(
            f"top-k diverges from the fp32 oracle beyond near-tie noise "
            f"({n_bad}/{64 * K} entries) — refusing to report a throughput "
            "number for wrong results"
        )
    np.testing.assert_allclose(s[:64], ref_s, atol=2e-5)


def _tunnel_e2e_sample(index, queries, reps: int = 3) -> float:
    """One group of raw end-to-end runs through the tunnel; returns the best
    (lowest) wall time. Groups are taken at several points across the bench
    runtime because tunnel bandwidth regimes change on minutes, not
    milliseconds — consecutive best-of-N sampled ONE regime."""
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        index.search(queries, k=K, batch_size=E2E_BATCH)
        dt = min(dt, time.perf_counter() - t0)
    return dt


def _engine_seconds(jitted_loop, args, reps: int, iters: int = 3) -> float:
    """Amortized per-dispatch engine time: the op runs ``reps`` times inside
    one jit via fori_loop with a data-dependent carry (the ~25-30ms tunnel
    dispatch floor would otherwise dominate), synchronized by fetching one
    scalar (fetching outputs would measure D2H, not compute)."""
    float(jitted_loop(*args))  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jitted_loop(*args))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def _device_100k(corpus, queries, *, on_tpu: bool):
    import jax
    import jax.numpy as jnp

    from rankpo_tpu.index import FlatIPIndex

    index = FlatIPIndex(corpus)
    _oracle_gate(index, corpus, queries)

    q_dev = jax.device_put(jnp.asarray(queries[:BATCH]))
    search_fn = index.search_callable(K)
    REPS = 4 if on_tpu else 1  # CPU smoke: skip the amortization loop

    @jax.jit
    def loop(q, *arrs):
        def body(i, carry):
            s, _ = search_fn(*arrs, q + carry * 0.0)
            return carry + s[0, 0] * 1e-20
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    dt_dev = _engine_seconds(
        loop, (q_dev,) + index.search_arrays, REPS,
        iters=3 if on_tpu else 1,
    )
    return index, BATCH / dt_dev


def _device_1m():
    """1M-passage engine QPS, exact fp32 and int8 storage, oracle-gated.

    Corpus generated on device; host oracle = argsort of the fetched fp32
    score matrix for a small query probe (see module docstring)."""
    import jax
    import jax.numpy as jnp

    from rankpo_tpu.ops.topk import matmul_topk

    kq, kc = jax.random.split(jax.random.key(7))

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def gen(key, n, d):
        x = jax.random.normal(key, (n, d), jnp.float32)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    c_dev = gen(kc, N_CORPUS_1M, DIM)
    q_dev = gen(kq, BATCH_1M, DIM)
    jax.block_until_ready(c_dev)

    # host-side oracle for the probe: fp32-precision scores fetched, stable
    # argsort (FAISS tie rule: lowest index first)
    probe_scores = np.asarray(
        jax.jit(
            lambda q, c: jnp.einsum(
                "qd,nd->qn", q, c, preferred_element_type=jnp.float32,
                precision="float32",
            )
        )(q_dev[:ORACLE_PROBE_1M], c_dev)
    )
    ref_i = np.argsort(-probe_scores, axis=1, kind="stable")[:, :K]
    ref_s = np.take_along_axis(probe_scores, ref_i, axis=1)

    exact = jax.jit(lambda q, c: matmul_topk(q, c, k=K))
    s, i = jax.device_get(exact(q_dev, c_dev))
    s, i = s[:ORACLE_PROBE_1M], i[:ORACLE_PROBE_1M]
    mismatch = i != ref_i
    n_bad = int(mismatch.sum())
    if n_bad > ORACLE_PROBE_1M * K // 200 or not np.allclose(
        s[mismatch], ref_s[mismatch], atol=2e-5
    ):
        raise AssertionError(
            f"1M exact top-k diverges from the host oracle beyond near-tie "
            f"noise ({n_bad}/{ORACLE_PROBE_1M * K} entries)"
        )
    np.testing.assert_allclose(s, ref_s, atol=2e-5)

    REPS = 4

    @jax.jit
    def loop_exact(c, q):
        def body(i, carry):
            s, _ = matmul_topk(q + carry * 0.0, c, k=K)
            return carry + s[0, 0] * 1e-20
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    qps_exact = BATCH_1M / _engine_seconds(loop_exact, (c_dev, q_dev), REPS)

    # int8 storage (4x memory): symmetric per-row max-abs quantization on
    # device; report measured recall vs the fp32 oracle (quantization is an
    # accuracy trade, not exact — the honest gate is the recall number)
    @jax.jit
    def quantize(c):
        scale = jnp.maximum(jnp.max(jnp.abs(c), axis=1) / 127.0, 1e-12)
        q8 = jnp.clip(jnp.round(c / scale[:, None]), -127, 127).astype(jnp.int8)
        return q8, scale.astype(jnp.float32)

    c_int8, row_scale = quantize(c_dev)
    jax.block_until_ready(c_int8)
    del c_dev, probe_scores  # free the 4 GB fp32 corpus before timing int8

    def int8_search(q, c, scale):
        return matmul_topk(q.astype(jnp.bfloat16), c, k=K, col_scale=scale)

    i8 = jax.device_get(
        jax.jit(int8_search)(q_dev[:ORACLE_PROBE_1M], c_int8, row_scale)[1]
    )
    recall_int8 = float(
        np.mean([
            len(set(i8[r].tolist()) & set(ref_i[r].tolist())) / K
            for r in range(ORACLE_PROBE_1M)
        ])
    )

    @jax.jit
    def loop_int8(c, scale, q):
        def body(i, carry):
            s, _ = int8_search(q + carry * 0.0, c, scale)
            return carry + s[0, 0] * 1e-20
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    qps_int8 = BATCH_1M / _engine_seconds(
        loop_int8, (c_int8, row_scale, q_dev), REPS
    )
    return qps_exact, qps_int8, recall_int8


def _device_1m_ivfpq():
    """Approximate 1M tier: IVF + residual PQ with the trained OPQ rotation
    (rankpo_tpu.index.IVFIPIndex, pq_m=64 pq_rotate='opq') on a clustered
    power-law corpus (2048 blobs, i^-0.5 spectrum). Returns (qps, recall)
    with recall@100 vs this corpus's own host fp32 oracle probe."""
    import jax
    import jax.numpy as jnp

    from rankpo_tpu.index import IVFIPIndex

    kc, ka, kn, kq = jax.random.split(jax.random.key(11), 4)
    n_blobs = PQ_1M_BLOBS

    @functools.partial(jax.jit, static_argnums=(2,))
    def gen(key_assign, key_noise, n, centers):
        rows = (
            jnp.take(
                centers, jax.random.randint(key_assign, (n,), 0, n_blobs), 0
            )
            + (1.0 / (DIM ** 0.5))
            * jax.random.normal(key_noise, (n, DIM), jnp.float32)
        )
        w = (1.0 + jnp.arange(DIM, dtype=jnp.float32)) ** -0.5
        rows = rows * w
        return rows / jnp.linalg.norm(rows, axis=-1, keepdims=True)

    centers = jax.jit(
        lambda k: (
            lambda c: c / jnp.linalg.norm(c, axis=-1, keepdims=True)
        )(jax.random.normal(k, (n_blobs, DIM), jnp.float32))
    )(kc)
    c_dev = gen(ka, kn, N_CORPUS_1M, centers)
    kqa, kqn = jax.random.split(kq)
    q_dev = gen(kqa, kqn, BATCH_1M, centers)
    jax.block_until_ready(c_dev)

    probe_scores = np.asarray(
        jax.jit(
            lambda q, c: jnp.einsum(
                "qd,nd->qn", q, c, preferred_element_type=jnp.float32,
                precision="float32",
            )
        )(q_dev[:ORACLE_PROBE_1M], c_dev)
    )
    ref_i = np.argsort(-probe_scores, axis=1, kind="stable")[:, :K]
    del probe_scores

    index = IVFIPIndex.from_sharded(
        c_dev, N_CORPUS_1M, mesh=None, n_clusters=PQ_1M_CLUSTERS,
        nprobe=PQ_1M_NPROBE, pq_m=PQ_1M_M, pq_rotate="opq",
    )
    del c_dev  # the codes (64 MB) replace the 4 GB fp32 corpus

    _, idx = index.search(
        np.asarray(q_dev[:ORACLE_PROBE_1M]), k=K,
        batch_size=ORACLE_PROBE_1M,
    )
    recall = float(
        np.mean([
            len(set(idx[r].tolist()) & set(ref_i[r].tolist())) / K
            for r in range(ORACLE_PROBE_1M)
        ])
    )

    REPS = 4
    fn = index.search_callable(K)

    @jax.jit
    def loop(q, *arrs):
        def body(i, carry):
            s, _ = fn(*arrs, q + carry * 0.0)
            return carry + s[0, 0] * 1e-20
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    qps = BATCH_1M / _engine_seconds(
        loop, (q_dev,) + index.search_arrays, REPS
    )
    return qps, recall


def _wait_for_backend(max_wait_s: float = 1800, probe_timeout_s: float = 240):
    """Ride out transient remote-TPU tunnel outages (observed: 45+ min of
    'backend setup/compile error (Unavailable)') with a bounded retry before
    committing this process to backend init — jax caches a failed plugin
    discovery for the life of the process, so the probe runs in a SUBPROCESS
    (sitecustomize registers the tunnel plugin there identically) and the
    parent only initializes once a probe has succeeded. Progress goes to
    stderr; stdout stays the one JSON line."""
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s,
                capture_output=True,
                env=os.environ.copy(),
            )
            if r.returncode == 0:
                return
            err = r.stderr.decode(errors="replace").strip().splitlines()
            reason = err[-1] if err else f"exit {r.returncode}"
        except subprocess.TimeoutExpired:
            reason = f"probe timed out after {probe_timeout_s:.0f}s"
        if time.monotonic() >= deadline:
            # last resort: a valid, honestly-labeled CPU-backend JSON line
            # beats a crash with no number. Re-exec on the CPU backend (the
            # plugin discovery failure is cached for the process lifetime,
            # so a clean exec, not a flag flip). The output carries
            # backend=cpu + tpu_unavailable so the outage is unmistakable.
            print(
                f"bench: backend still unavailable after {max_wait_s:.0f}s "
                f"({reason}); falling back to the CPU backend",
                file=sys.stderr, flush=True,
            )
            env = os.environ.copy()
            env["JAX_PLATFORMS"] = "cpu"
            env["PALLAS_AXON_POOL_IPS"] = ""
            env["RANKPO_BENCH_TPU_UNAVAILABLE"] = "1"
            os.execve(sys.executable, [sys.executable, __file__], env)
        print(
            f"bench: backend probe {attempt} failed ({reason}); retrying",
            file=sys.stderr, flush=True,
        )
        time.sleep(30)


def _flash_fwd_ms() -> float:
    """Flash-attention fwd at the docs/BENCHMARKS.md headline shape
    (B4/S4096/H16-KV8/D128 causal bf16), amortized — the floors-gate
    probe for kernel regressions (same harness as benchmarks/flash_bench)."""
    import jax
    import jax.numpy as jnp

    from rankpo_tpu.ops.flash_attention import flash_attention

    b, s, hq, hkv, d = 4, 4096, 16, 8, 128
    reps = 8
    rng = np.random.RandomState(0)
    q = jax.device_put(jnp.asarray(rng.randn(b, s, hq, d), jnp.bfloat16))
    k = jax.device_put(jnp.asarray(rng.randn(b, s, hkv, d), jnp.bfloat16))
    v = jax.device_put(jnp.asarray(rng.randn(b, s, hkv, d), jnp.bfloat16))
    mask = jax.device_put(jnp.ones((b, s), jnp.int32))

    @jax.jit
    def loop(q_, k_, v_, m_):
        def body(i, carry):
            out = flash_attention(
                q_ + carry.astype(q_.dtype) * 0, k_, v_, mask=m_, causal=True
            )
            return carry + out.reshape(-1)[0].astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    return 1e3 * _engine_seconds(loop, (q, k, v, mask), reps)


def _check_floors(out: dict, *, on_tpu: bool) -> None:
    """Annotate the bench JSON with pass/fail vs benchmarks/floors.json
    (the cross-round regression gate). Compares ON-DEVICE numbers only —
    a failure is an engine/compiler regression, distinct from tunnel
    weather, which only moves tunnel_e2e_qps (not gated)."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks",
        "floors.json",
    )
    try:
        with open(path) as f:
            floors = json.load(f)
    except Exception as exc:  # pragma: no cover - missing file is non-fatal
        out["floors"] = {"pass": None, "error": f"floors.json unreadable: {exc}"}
        return
    if not on_tpu:
        out["floors"] = {
            "pass": None,
            "skipped": "cpu backend — floors are real-TPU on-device numbers",
        }
        return
    checks: dict = {}
    not_measured = []
    ok_all = True
    for key, spec in floors.items():
        if key.startswith("_"):
            continue
        val = out.get(key)
        if val is None:
            not_measured.append(
                {"key": key, "measured_by": spec.get("measured_by", "")}
            )
            continue
        ok = True
        bounds = {}
        if "min" in spec:
            bounds["min"] = spec["min"]
            ok = ok and val >= spec["min"]
        if "max" in spec:
            bounds["max"] = spec["max"]
            ok = ok and val <= spec["max"]
        checks[key] = {"value": val, **bounds, "pass": ok}
        ok_all = ok_all and ok
    out["floors"] = {
        "pass": ok_all,
        "checks": checks,
        "not_measured": not_measured,
    }


def main():
    tpu_unavailable = os.environ.get("RANKPO_BENCH_TPU_UNAVAILABLE") == "1"
    if not tpu_unavailable:
        _wait_for_backend()
    import jax

    corpus, queries = _make_data()
    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    index, on_device_qps = _device_100k(corpus, queries, on_tpu=on_tpu)

    # tunnel e2e sampled in groups spread across the bench's several-minute
    # runtime (1M + CPU work in between) to span tunnel-bandwidth regimes
    e2e_dt = _tunnel_e2e_sample(index, queries, reps=3 if on_tpu else 1)

    if on_tpu:
        qps_1m_exact, qps_1m_int8, recall_1m_int8 = _device_1m()
        qps_1m_pq, recall_1m_pq = _device_1m_ivfpq()
        flash_ms = _flash_fwd_ms()
    else:  # CPU smoke: the 1M matmuls would take minutes per dispatch
        qps_1m_exact = qps_1m_int8 = recall_1m_int8 = None
        qps_1m_pq = recall_1m_pq = None
        flash_ms = None

    cpu_qps = _cpu_qps(corpus, queries)
    if on_tpu:
        e2e_dt = min(e2e_dt, _tunnel_e2e_sample(index, queries))

    # equal-footing headline: engine time + host PCIe transfer model
    h2d_bytes = N_QUERIES * DIM * 4
    d2h_bytes = N_QUERIES * K * (4 + 4)  # fp32 scores + int32 idx (+slack)
    t_transfer = (h2d_bytes + d2h_bytes) / (PCIE_GBPS * 1e9)
    t_engine = N_QUERIES / on_device_qps
    value = N_QUERIES / (t_engine + t_transfer)
    tunnel_qps = N_QUERIES / e2e_dt

    out = {
        "metric": f"exact_topk_qps_{N_CORPUS // 1000}k_corpus_d{DIM}_k{K}",
        "value": round(value, 2),
        "unit": "queries/sec",
        "vs_baseline": round(value / cpu_qps, 2),
        "baseline_cpu_qps": round(cpu_qps, 2),
        "on_device_qps": round(on_device_qps, 2),
        "tunnel_e2e_qps": round(tunnel_qps, 2),
        "tunnel_vs_baseline": round(tunnel_qps / cpu_qps, 2),
        "metric_definition": (
            "value = equal-footing QPS: measured on-device engine time for "
            f"{N_QUERIES} queries + modeled host PCIe transfer "
            f"({(h2d_bytes + d2h_bytes) / 1e6:.1f} MB at {PCIE_GBPS} GB/s). "
            "The raw dev-harness number is tunnel_e2e_qps (remote-TPU tunnel, "
            "8-85 MB/s day swings); the CPU baseline pays no transfer "
            "in-process. fp32 oracle gate enforced before reporting. "
            "baseline_cpu_qps is this repo's own C++ blocked matmul+heap "
            "top-k (native/rankpo_native.cpp), NOT FAISS (not installed "
            "here); FAISS IndexFlatIP's blocked GEMM would likely score "
            "higher, but not by the two orders of magnitude vs_baseline "
            "clears."
        ),
        "transfer_model": {
            "pcie_gbps": PCIE_GBPS,
            "h2d_mb": round(h2d_bytes / 1e6, 2),
            "d2h_mb": round(d2h_bytes / 1e6, 2),
        },
        "qps_1m_exact": None if qps_1m_exact is None else round(qps_1m_exact, 2),
        "qps_1m_int8": None if qps_1m_int8 is None else round(qps_1m_int8, 2),
        "recall_1m_int8": (
            None if recall_1m_int8 is None else round(recall_1m_int8, 4)
        ),
        # approximate tier: IVF4096 + PQ m=64 with the trained OPQ rotation
        # (64 B/row — the 100M-rows-on-one-chip codec) on a clustered
        # power-law 1M corpus (IVF's intended regime; the exact/int8 corpus
        # above is deliberately isotropic, IVF's worst case). recall@100 vs
        # that corpus's own fp32 oracle probe.
        "qps_1m_pq_opq": None if qps_1m_pq is None else round(qps_1m_pq, 2),
        "recall_1m_pq_opq": (
            None if recall_1m_pq is None else round(recall_1m_pq, 4)
        ),
        # flash fwd at the BENCHMARKS.md headline shape — the kernel
        # regression probe for the floors gate
        "flash_fwd_ms": None if flash_ms is None else round(flash_ms, 2),
        "backend": backend,
    }
    _check_floors(out, on_tpu=on_tpu and not tpu_unavailable)
    if tpu_unavailable:
        out["tpu_unavailable"] = True
        out["metric_definition"] = (
            "TPU TUNNEL OUTAGE: the remote-TPU backend stayed unavailable "
            "through the full bounded retry window, so these are CPU-backend "
            "fallback numbers (engine correctness still oracle-gated). "
        ) + out["metric_definition"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
