"""HTTP retrieval server: /search over a mesh-sharded FlatIP index.

POST /search {"queries": ["..."], "k": 10} -> {"results": [...]}
POST /add    {"passages": ["..."][, "ids": [...]]} -> extends the index
POST /remove {"ids": [...]} -> drops passages (FAISS renumbering)
POST /save   [{"path": "..."}] -> persist the live index (write_index)
GET  /healthz -> {"status": "ok", "ntotal": N}
GET  /statsz  -> serving counters
"""

from __future__ import annotations

import argparse
import json
import logging
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from rankpo_tpu.cli.arguments import resolve_tokenizer
from rankpo_tpu.core.mesh import local_mesh
from rankpo_tpu.data.datasets import load_eval_corpus
from rankpo_tpu.index import InferenceEncoder
from rankpo_tpu.models import load_pretrained
from rankpo_tpu.serve import RetrievalService
from rankpo_tpu.utils.logging import setup_logging

logger = logging.getLogger(__name__)


def make_handler(service: RetrievalService, batcher=None, k_max: int = 100,
                 index_file: str | None = None, autosave: bool = False):
    """``batcher``: a MicroBatcher; single-query requests route through it so
    concurrent clients share device dispatches (multi-query requests are
    already batched by construction). Every path searches at the single
    compiled ``k_max`` and slices to the client's k — per-request k values
    are static shapes, so honoring them raw would recompile on each new k
    (and the limit must be uniform: one cap for 1-query and N-query posts).

    ``index_file``: default target for POST /save (and ``autosave``), the
    live counterpart of the FAISS ``write_index`` persistence the server
    restarts from. ``autosave``: persist to ``index_file`` after every
    successful /add //remove — a mutation survives a restart without the
    operator remembering to /save (the mutation response waits for the
    save; each save snapshots the atomic state tuple and lands by atomic
    rename, so concurrent saves stay internally consistent)."""

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok", "ntotal": service.ntotal})
            elif self.path == "/statsz":
                stats = {"ntotal": service.ntotal, "k_max": k_max}
                if batcher is not None:
                    n_d = batcher.n_dispatches
                    stats.update(
                        microbatch_dispatches=n_d,
                        microbatch_queries=batcher.n_queries,
                        avg_group_size=round(batcher.n_queries / n_d, 2)
                        if n_d else None,
                    )
                self._reply(200, stats)
            else:
                self._reply(404, {"error": "not found"})

        def _reply_mutated(self, extra: dict) -> None:
            """Send the response for a mutation that ALREADY COMMITTED.
            The autosave runs here, after the commit: if it fails, the
            reply must say the mutation applied (mutated=true, HTTP 500 —
            a server-side I/O problem, not a rejected request), or a
            client treating 4xx as 'rejected' would retry and duplicate
            the mutation."""
            payload = {"status": "ok", "ntotal": service.ntotal, **extra}
            if autosave and index_file:
                try:
                    service.save_index(index_file)
                    payload["saved"] = index_file
                except Exception as e:
                    self._reply(500, {
                        "error": f"autosave failed: {e}",
                        "mutated": True,
                        "ntotal": service.ntotal,
                        **extra,
                    })
                    return
            self._reply(200, payload)

        def do_POST(self):
            if self.path == "/add":
                # FAISS index.add analog: encode + extend the live index.
                # In-flight searches finish on the old index (atomic swap).
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length))
                    service.add_passages(req["passages"],
                                         ids=req.get("ids"))
                except Exception as e:
                    self._reply(400, {"error": str(e)})
                    return
                self._reply_mutated({})
                return
            if self.path == "/remove":
                # FAISS remove_ids analog: drop passages by corpus position
                # (remaining ids shift down, FAISS renumbering semantics) —
                # or by stable external id under --stable_ids (IndexIDMap).
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length))
                    removed = service.remove_passages(req["ids"])
                except Exception as e:
                    self._reply(400, {"error": str(e)})
                    return
                self._reply_mutated({"removed": removed})
                return
            if self.path == "/save":
                # live FAISS write_index analog: persist the CURRENT index
                # (mutations included) so a restart with --index_file skips
                # the corpus encode and the whole build. Body may carry
                # {"path": ...}; defaults to the server's --index_file.
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length)) if length else {}
                    path = req.get("path") or index_file
                    if not path:
                        raise ValueError(
                            "no save target: pass {'path': ...} or start "
                            "the server with --index_file"
                        )
                    service.save_index(path)
                    self._reply(200, {"status": "ok", "saved": path,
                                      "ntotal": service.ntotal})
                except Exception as e:
                    self._reply(400, {"error": str(e)})
                return
            if self.path != "/search":
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                queries = req.get("queries")
                if queries is None and "query" in req:
                    queries = [req["query"]]  # single-query sugar
                if not isinstance(queries, list) or not all(
                    isinstance(q, str) for q in queries
                ):
                    self._reply(400, {
                        "error": "body must carry 'queries': [str, ...] "
                                 "(or 'query': str)"
                    })
                    return
                k = int(req.get("k", 10))
                if k > k_max:
                    self._reply(400, {
                        "error": f"k={k} exceeds serving k_max={k_max} "
                                 "(start the server with --serving_k_max)"
                    })
                    return
                # FAISS SearchParameters analog: IDSelector filters
                # (external ids under --stable_ids, corpus positions
                # otherwise) and per-call nprobe/candidates overrides.
                # Such requests bypass the micro-batcher — the parameters
                # are per-REQUEST, a grouped dispatch shares one search
                # program.
                sel = {
                    key: req[key]
                    for key in ("allowed_ids", "disallowed_ids")
                    if req.get(key) is not None
                }
                for key in ("nprobe", "candidates"):
                    if req.get(key) is not None:
                        sel[key] = int(req[key])
                if batcher is not None and len(queries) == 1 and not sel:
                    results = [batcher.query(queries[0], k=k)]
                else:
                    from rankpo_tpu.serve.service import finalize_hits

                    k_eff = min(k_max, service.ntotal or k_max)
                    # return_passages=True: texts attach inside query() from
                    # the snapshot it searched (concurrent /add //remove safe)
                    results = [
                        finalize_hits(r, k)
                        for r in service.query(queries, k=k_eff,
                                               return_passages=True, **sel)
                    ]
                self._reply(200, {"results": results})
            except Exception as e:  # surface errors as JSON
                self._reply(400, {"error": str(e)})

        def log_message(self, fmt, *args):
            logger.info("%s - %s", self.address_string(), fmt % args)

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name_or_path", required=True)
    parser.add_argument("--tokenizer_name", default=None)
    parser.add_argument("--corpus_data", default=None,
                        help="jsonl corpus; optional when --index_file exists")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--max_query_length", type=int, default=512)
    parser.add_argument("--max_passage_length", type=int, default=512)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--recall_target", type=float, default=1.0,
                        help="<1.0 = approx top-k serving mode (8x QPS @0.95)")
    parser.add_argument("--index_dtype", default="float32",
                        choices=["float32", "bfloat16", "int8"],
                        help="index storage: fp32 exact / bf16 2x / int8 4x memory")
    parser.add_argument("--index_type", default="flat",
                        help="flat = exact brute force (FAISS IndexFlatIP "
                             "parity); refine = two-stage PCA prefilter + "
                             "exact rerank; ivf = clustered inverted-file "
                             "probing (both approximate, tuned to "
                             "--recall_target, fewer FLOPs per query); or "
                             "a FAISS index_factory-style spec, e.g. "
                             "'OPQ64,IVF4096,PQ64' or 'PCA128,Flat' (the "
                             "spec then supplies the per-tier knobs and "
                             "the --refine_*/--ivf_* flags are ignored)")
    parser.add_argument("--refine_dim", type=int, default=256,
                        help="refine index stage-1 PCA dimension")
    parser.add_argument("--refine_candidates", default="auto",
                        help="refine rerank candidate count, or 'auto' to "
                             "tune at build time against --recall_target")
    parser.add_argument("--ivf_clusters", default="auto",
                        help="ivf cluster count, or 'auto' (~4*sqrt(N))")
    parser.add_argument("--ivf_nprobe", default="auto",
                        help="ivf probed clusters per query, or 'auto' to "
                             "tune at build time against --recall_target")
    parser.add_argument("--ivf_reduced_dim", type=int, default=0,
                        help="> 0 enables the IVF+PCA hybrid: probed rows "
                             "score in this projected dimension (d'/D of "
                             "the gather bytes), top candidates rerank "
                             "exactly at full width")
    parser.add_argument("--ivf_candidates", default="auto",
                        help="hybrid rerank pool size, or 'auto' (~2k)")
    parser.add_argument("--ivf_pq_m", type=int, default=0,
                        help="> 0 enables IVF+PQ (residual product "
                             "quantization): rows stored as this many uint8 "
                             "codes — 32x below bf16 rows at m=64/D=1024, "
                             "the 100M-passage tier; scores are ADC "
                             "approximations (exclusive with int8 storage "
                             "and --ivf_reduced_dim)")
    parser.add_argument("--ivf_pq_rotate", default="none",
                        choices=("none", "random", "opq"),
                        help="orthogonal pre-rotation for the PQ codec: "
                             "'random' (seeded QR — spreads an anisotropic "
                             "spectrum over the m subspaces) or 'opq' "
                             "(rotation trained against the codec, Ge et "
                             "al. / FAISS OPQMatrix analog); requires "
                             "--ivf_pq_m")
    parser.add_argument("--ivf_balance_eta", type=float, default=0.0,
                        help="balanced k-means assignment-bias step for IVF "
                             "builds (0 = off): evens Zipf-skewed cluster "
                             "fills against the fixed per-cluster capacity "
                             "(index/ivf.py _lloyd_body)")
    parser.add_argument("--index_file", default=None,
                        help="persisted index (.npz): loaded if it exists, "
                             "else built from --corpus_data and saved here")
    parser.add_argument("--pack_queries", action="store_true",
                        help="sequence-pack each micro-batch group's queries "
                             "(mixed-length groups stop paying the longest "
                             "member's length bucket; one compiled program "
                             "per row bucket). Measured win for long/"
                             "heavy-tailed query loads (>=~512 tokens mixed "
                             "lengths: +27%% micro-batched, 3x direct at "
                             "S1024); LOSES under short-query traffic where "
                             "the dispatch floor hides the encode "
                             "(docs/BENCHMARKS.md)")
    parser.add_argument("--pack_max_segments", type=int, default=16,
                        help="packing: max queries per packed row")
    parser.add_argument("--microbatch_wait_ms", type=float, default=3.0,
                        help="dynamic micro-batching window for concurrent "
                             "single-query requests; 0 disables")
    parser.add_argument("--microbatch_max", type=int, default=64)
    parser.add_argument("--serving_k_max", type=int, default=100,
                        help="all requests search once at this k and slice "
                             "to the client's k (k is a compiled static "
                             "shape); requests above it get a 400")
    parser.add_argument("--stable_ids", action="store_true",
                        help="FAISS IndexIDMap analog: passages carry "
                             "stable external int64 ids that survive "
                             "/remove (no renumbering); /add accepts "
                             "'ids', /remove takes external ids, hits "
                             "gain an 'id' field")
    parser.add_argument("--warmup", default="full",
                        choices=["full", "fast", "off"],
                        help="pre-compile serving programs at startup: "
                             "'full' = every (batch, length) bucket, "
                             "'fast' = shortest length bucket only")
    parser.add_argument("--rewarm_after_mutations", action="store_true",
                        help="/add and /remove replay the startup warmup "
                             "before returning when a mutation DROPPED "
                             "compiled programs (storage outgrew its "
                             "buffer); shape-preserving mutations carry "
                             "programs over and never rewarm")
    parser.add_argument("--autosave", action="store_true",
                        help="persist the index to --index_file after every "
                             "successful /add //remove (the mutation "
                             "response waits for the save): mutations "
                             "survive restarts without an explicit /save")
    parser.add_argument("--mutation_headroom", type=float, default=0.25,
                        help="extra pad-row fraction pre-paid when an /add "
                             "outgrows the index storage buffer: later adds "
                             "land in the headroom, keep storage shapes, "
                             "and carry every compiled serving program "
                             "over (no recompile, no rewarm)")
    parser.add_argument("--log_level", default="info")
    # multi-host pod serving: every process runs this CLI with the same
    # corpus/index; rank 0 binds HTTP, ranks 1.. replay dispatches
    parser.add_argument("--coordinator_address", default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args(argv)
    if args.autosave and not args.index_file:
        parser.error("--autosave needs --index_file as the save target")

    from rankpo_tpu.core.mesh import initialize_distributed

    # BEFORE setup_logging: rank-aware logging calls jax.process_index(),
    # which initializes the backend — too late for jax.distributed
    initialize_distributed(
        args.coordinator_address, args.num_processes, args.process_id
    )
    setup_logging(args.log_level)
    mesh = local_mesh()
    config, params = load_pretrained(args.model_name_or_path)
    tokenizer = resolve_tokenizer(args.tokenizer_name, args.model_name_or_path)
    encoder = InferenceEncoder(config, params, tokenizer, mesh=mesh)
    import jax.numpy as jnp

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
             "int8": jnp.int8}[args.index_dtype]
    if args.index_type not in ("flat", "refine", "ivf") and \
            args.index_dtype == "float32":
        # factory spec ("SQ8", "IVF..,SQ8", ...): let the spec's storage
        # component through; a non-default --index_dtype still wins
        dtype = None
    index_kwargs = {}
    if args.index_type == "refine":
        index_kwargs["reduced_dim"] = args.refine_dim
        index_kwargs["candidates"] = (
            "auto" if args.refine_candidates == "auto"
            else int(args.refine_candidates)
        )
    elif args.index_type == "ivf":
        index_kwargs["n_clusters"] = (
            "auto" if args.ivf_clusters == "auto" else int(args.ivf_clusters)
        )
        index_kwargs["nprobe"] = (
            "auto" if args.ivf_nprobe == "auto" else int(args.ivf_nprobe)
        )
        if args.ivf_reduced_dim > 0:
            index_kwargs["reduced_dim"] = args.ivf_reduced_dim
            index_kwargs["candidates"] = (
                "auto" if args.ivf_candidates == "auto"
                else int(args.ivf_candidates)
            )
        if args.ivf_pq_m > 0:
            index_kwargs["pq_m"] = args.ivf_pq_m
            if args.ivf_pq_rotate != "none":
                index_kwargs["pq_rotate"] = args.ivf_pq_rotate
        elif args.ivf_pq_rotate != "none":
            # fail loudly rather than silently build a plain bf16 IVF index
            # 32x the memory of the codec the operator asked for
            parser.error("--ivf_pq_rotate requires --ivf_pq_m")
        if args.ivf_balance_eta:
            index_kwargs["balance_eta"] = args.ivf_balance_eta
    if args.ivf_balance_eta and args.index_type != "ivf":
        parser.error("--ivf_balance_eta requires --index_type ivf")
    service = RetrievalService(
        encoder, mesh=mesh, max_query_length=args.max_query_length,
        recall_target=args.recall_target, index_dtype=dtype,
        index_type=args.index_type, index_kwargs=index_kwargs,
        pack_queries=args.pack_queries,
        pack_max_segments=args.pack_max_segments,
        stable_ids=args.stable_ids,
        rewarm_after_mutation=args.rewarm_after_mutations,
        mutation_headroom=args.mutation_headroom,
    )
    import os

    if args.index_file and not args.index_file.endswith(".npz"):
        # np.savez_compressed always appends .npz; without this the restart
        # os.path.exists check would never match and the server would silently
        # re-encode the corpus on every start
        args.index_file += ".npz"
    if args.index_file and os.path.exists(args.index_file):
        service.load_index_file(args.index_file)  # restart path: skip encode
    else:
        if args.corpus_data is None:
            parser.error(
                "--corpus_data is required unless --index_file points at an "
                "existing persisted index"
            )
        corpus = load_eval_corpus(args.corpus_data)
        service.build_index(
            corpus, max_passage_length=args.max_passage_length,
            batch_size=args.batch_size,
        )
        if args.index_file:
            service.save_index(args.index_file)
    import jax

    frontend = service
    if jax.process_count() > 1:
        from rankpo_tpu.serve.multihost import MultihostFrontend

        frontend = MultihostFrontend(service)
        if jax.process_index() != 0:
            frontend.follower_loop()  # blocks until rank 0 broadcasts stop
            return

    if args.warmup != "off":
        # multi-host: warm THROUGH the frontend — a bare service.query on
        # rank 0 would hang waiting for the other processes' array shards
        # the UNCLAMPED serving k: query() re-clamps per index snapshot, so
        # a rewarm after a mutation that moved ntotal warms the CURRENT
        # k_eff, not the startup corpus's (a baked min() here left the
        # post-mutation clamp cold)
        service.warmup(
            k=args.serving_k_max,
            query_fn=frontend.query if frontend is not service else None,
            lengths=(
                (getattr(service.encoder, "length_multiple", 64),)
                if args.warmup == "fast" else None
            ),
        )

    batcher = None
    if args.microbatch_wait_ms > 0:
        from rankpo_tpu.serve.batching import MicroBatcher

        batcher = MicroBatcher(
            frontend, max_batch=args.microbatch_max,
            max_wait_ms=args.microbatch_wait_ms, k_max=args.serving_k_max,
        )
    server = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(frontend, batcher, k_max=args.serving_k_max,
                     index_file=args.index_file, autosave=args.autosave),
    )
    logger.info("serving %d passages on %s:%d", service.ntotal, args.host, args.port)
    server.serve_forever()


if __name__ == "__main__":
    main()
