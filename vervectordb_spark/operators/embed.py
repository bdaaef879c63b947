"""Text → embedding ingest (reference S6 — the *implied* pipeline).

The reference declares sentence-transformers + jieba + a model download
script and ships a Chinese corpus, but no code path ever calls them
(SURVEY.md §2.1 S6: pyproject.toml:7-13, scripts/model_download.sh:1,
data/datawhale.txt — the examples use random vectors instead). This module
realizes that intended pipeline Spark-first, with two embedder tiers:

  hashed_bow_embedding   deterministic hashing-trick bag-of-words →
                         L2-normalized dim-wide float vector. Pure column
                         expressions (md5 bucket + per-bucket counts), so
                         the FULL pipeline — read text → tokenize → embed →
                         store → search — is DuckDB-oracle-checkable.
  model_embedding        the production slot: a sentence-transformer (or
                         any HF model) inside mapInPandas, one batched
                         forward pass per Arrow batch. The model library is
                         not in this container → stubbed behind an
                         import-try with the exact batch/schema contract.

Tokenization handles the corpus's zh/latin mix the way jieba-less
deployments do: CJK codepoints become single-char tokens, latin text
splits on whitespace (`mixed_tokens_expr`). A real jieba segmentation
drops into the same mapInPandas slot as the model embedder.

Scale: hashing-trick embedding is a map-only projection — it runs inside
the ingest scan, no shuffle, no driver state; dim is a knob (counts array
built with dim subexpressions — keep dim ≤ a few hundred; larger dims
move to the mapInPandas path where the histogram is one NumPy pass).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vervectordb_spark.functions.hashing import md5_long
from vervectordb_spark.functions.partitioning import widen_narrow_scan
from vervectordb_spark.operators.dedup import tokens_expr


def mixed_tokens_expr(text_col: Column | str) -> Column:
    """zh/latin mixed tokenization without jieba: each CJK ideograph is a
    token; non-CJK text tokenizes on whitespace. Deterministic and
    portable (regex-based on both engines)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    spaced = F.regexp_replace(c, r"([\x{4e00}-\x{9fff}])", " $1 ")
    return tokens_expr(spaced)


def _embed_arrow(docs: DataFrame, dim: int, text_col: str, id_col: str,
                 cjk_aware: bool, passthrough: bool = False) -> DataFrame:
    """Arrow-batched hashed-BoW kernel — same values as the expr path
    (pytest-pinned bit-identical): tokens come from the JVM (single owner
    of the tokenization), one hashlib-md5 per token (== md5_long), counts
    via np.bincount, the norm accumulated left-to-right over the counts
    array so every IEEE operation matches the expr fold exactly. The expr
    path pays dim interpreted array scans per row (one size∘filter per
    bucket); this is one NumPy pass — prefer it for dim ≳ 32 or bulk
    ingest.

    passthrough=True keeps EVERY input column and appends `embedding`
    (original id name preserved, no vec_id alias) — the shape downstream
    map-only consumers need (quality scoring appends a fold projection on
    the same frame instead of a corpus×corpus self-join, VERDICT r6 #1a)."""
    import hashlib

    from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

    emb_field = StructField("embedding", ArrayType(FloatType()))
    if passthrough:
        out_schema = StructType(list(docs.schema.fields) + [emb_field])
    else:
        id_type = docs.schema[id_col].dataType
        out_schema = StructType([StructField("vec_id", id_type), emb_field])

    def kern(batches):
        import numpy as np
        import pandas as pd

        bucket_of: dict[str, int] = {}  # token vocab is Zipfian — memoize

        def bucket(t: str) -> int:
            b = bucket_of.get(t)
            if b is None:
                h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                b = bucket_of[t] = h % dim
            return b

        def vec_of(toks):
            toks = list(toks) if toks is not None else []
            counts = np.zeros(dim, dtype=np.float64)
            for t in toks:
                counts[bucket(t)] += 1.0
            acc = 0.0
            for c in counts:          # fold order == expr aggregate
                acc += c * c
            norm = acc ** 0.5
            if norm != 0.0:
                counts = counts / norm
            return np.asarray(counts, dtype=np.float32).tolist()

        for pdf in batches:
            vecs = [vec_of(t) for t in pdf["_toks"]]
            if passthrough:
                out = pdf.drop(columns=["_toks"])
                out["embedding"] = vecs
                yield out
            else:
                yield pd.DataFrame({"vec_id": list(pdf[id_col]),
                                    "embedding": vecs})

    toks = mixed_tokens_expr(text_col) if cjk_aware else tokens_expr(text_col)
    cols = [F.col(c) for c in docs.columns] if passthrough else [F.col(id_col)]
    return docs.select(*cols, toks.alias("_toks")).mapInPandas(
        kern, out_schema
    )


def embed_documents(docs: DataFrame, dim: int = 32, text_col: str = "text",
                    id_col: str = "doc_id", cjk_aware: bool = True,
                    kernel: str = "arrow",
                    passthrough: bool = False,
                    widen: bool = True) -> DataFrame:
    """The S6 ingest: (doc_id, embedding) ready for the vector store —
    `VectorStore.ingest(embed_documents(docs))` is the full reference
    pipeline text → vectors → searchable.

    Hashing-trick embedding: token → md5-bucket in [0, dim); vector =
    L2-normalized bucket counts; zero vector for empty text (preserving
    the cosine(0, ·) = 0 store contract). STAGED as bucket → counts → norm
    projections: a single nested expression would re-tokenize + re-hash
    once per count bucket (dim×; measured 8× slower at dim=32 —
    CollapseProject keeps non-cheap multi-referenced exprs staged, nested
    whens don't get subexpression elimination).

    kernel="arrow" (default — the serving/bench path, VERDICT r5 #6)
    computes the vectors in one NumPy pass per Arrow batch; kernel="expr"
    is the DuckDB-oracle-replayable spec the arrow kernel is pinned
    bit-identical to (tests/test_embed.py), measured 2.4-3.1x slower —
    keep it for oracle replay and plan-shape study, never the default.

    passthrough=True (both kernels) keeps every input column and appends
    `embedding` — no id rename, no column drop — so downstream per-doc
    projections (quality scoring) stay map-only instead of joining the
    embedding frame back against the corpus."""
    if passthrough and "embedding" in docs.columns:
        raise ValueError(
            "embed_documents(passthrough=True) appends an 'embedding' "
            "column but the input already has one; drop or rename it "
            "first (a duplicate name would only surface later as an "
            "opaque AnalysisException)")
    # per-row featurize is the heavy part — split a narrow (single-row-
    # group) scan across the session cores; structural no-op at
    # production layouts (functions/partitioning.py). Callers whose
    # OUTPUT feeds a distributed fit (MLlib LBFGS/KMeans treeAggregate)
    # pass widen=False: the split is parallelism-dependent, so widening
    # would make float reduction order — and thus weights/centroids —
    # vary with the core count (ADVICE r11, medium).
    if widen:
        docs = widen_narrow_scan(docs)
    if kernel == "arrow":
        return _embed_arrow(docs, dim, text_col, id_col, cjk_aware,
                            passthrough=passthrough)
    toks = mixed_tokens_expr(text_col) if cjk_aware else tokens_expr(text_col)
    # NULL text tokenizes to NULL; without the coalesce every count bucket
    # (and thus every embedding element) is NULL — the arrow kernel emits
    # a zero vector for the same row, and the store schema forbids null
    # elements. Empty array -> all-zero counts -> zero vector, matching.
    toks = F.coalesce(toks, F.array().cast("array<string>"))
    keep = ([F.col(c) for c in docs.columns] if passthrough
            else [F.col(id_col)])
    staged = (
        docs.select(*keep, toks.alias("_toks"))
        .withColumn("_bks", F.transform("_toks", lambda t: md5_long(t) % dim))
        .withColumn(
            # one parsed SQL string: the per-bucket Column form cost
            # ~0.3 s of py4j round-trips per call at dim=32
            "_counts",
            F.expr("array(" + ", ".join(
                f"cast(size(filter(_bks, b -> b = {i})) as double)"
                for i in range(dim)) + ")"),
        )
        .withColumn(
            "_norm",
            F.sqrt(F.aggregate(
                F.zip_with("_counts", "_counts", lambda x, y: x * y),
                F.lit(0.0), lambda a, x: a + x,
            )),
        )
    )
    normalized = F.when(F.col("_norm") == 0.0, F.col("_counts")).otherwise(
        F.transform("_counts", lambda x: x / F.col("_norm"))
    )
    emb = normalized.cast("array<float>").alias("embedding")
    if passthrough:
        return staged.select(*[F.col(c) for c in docs.columns], emb)
    return staged.select(F.col(id_col).alias("vec_id"), emb)


# ---------------------------------------------------------------------------
# real-model tier: vendored int8 word-vector checkpoint (offline-safe)
# ---------------------------------------------------------------------------

#: the committed tiny-SGNS checkpoint (tools/train_tiny_encoder.py —
#: skip-gram word2vec trained offline on the sf0.01 fixture corpus,
#: all-but-the-top post-processed, int8 unit rows)
DEFAULT_CHECKPOINT = None  # resolved lazily relative to the repo root


def _default_checkpoint_dir() -> str:
    import os

    return os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "..", "models", "tiny_sgns_16d"))


def mixed_tokens_py(text: str | None) -> list[str]:
    """Python twin of mixed_tokens_expr (CJK ideographs spaced to
    single-char tokens, lowercase, pinned-whitespace split) — the
    tokenizer the offline trainers and driver-side query embedding share
    with the JVM/SQL sides (parity pinned in tests/test_embed.py).
    Splits on words.WS_REGEX, NOT str.split(), so \\x1c-\\x1f / \\x85 /
    \\xa0 Unicode whitespace behaves exactly like the Java-regex twin."""
    import re

    from vervectordb_spark.functions.words import ws_tokens_py

    if not text:
        return []
    spaced = re.sub(r"([一-鿿])", r" \1 ", text)
    return ws_tokens_py(spaced)


def checkpoint_embed_text(text: str,
                          checkpoint_dir: str | None = None):
    """Driver-side single-text embedding with the EXACT serving
    arithmetic (order-free int64 sum of int8 rows, L2 normalize,
    float32) — for query vectors at serving time. Returns a NumPy
    float32 array of the checkpoint's dim."""
    import math

    import numpy as np

    words, mat, dim = load_checkpoint(checkpoint_dir)
    w2i = {w: i for i, w in enumerate(words)}
    idxs = [w2i[t] for t in mixed_tokens_py(text) if t in w2i]
    if not idxs:
        return np.zeros(dim, dtype=np.float32)
    s = mat[idxs].sum(axis=0)
    n2 = int((s * s).sum())
    if n2 == 0:
        return np.zeros(dim, dtype=np.float32)
    return (s / math.sqrt(float(n2))).astype(np.float32)


def checkpoint_parquet_path(checkpoint_dir: str | None = None) -> str:
    """Absolute path of the committed word-vector parquet — the single
    source the oracle SQL builders read (LEAF module on purpose: query
    modules must never import from each other, only from operators/ and
    functions/ — the registration cascade makes cross-query imports
    circular; see the queries.py import block)."""
    import os

    d = checkpoint_dir or _default_checkpoint_dir()
    return os.path.join(d, "word_vectors.parquet")


def load_checkpoint(checkpoint_dir: str | None = None):
    """(words list, int8 matrix (V, dim) as np.int64, dim) from the
    parquet checkpoint — driver-side, KB-class (the model IS bounded
    state, like centroids/codebooks)."""
    import json
    import os

    import numpy as np
    import pyarrow.parquet as pq_mod

    d = checkpoint_dir or _default_checkpoint_dir()
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    tbl = pq_mod.read_table(os.path.join(d, "word_vectors.parquet"))
    words = tbl.column("word").to_pylist()
    mat = np.array(tbl.column("vec").to_pylist(), dtype=np.int64)
    return words, mat, int(meta["dim"])


def checkpoint_embedding(docs: DataFrame, checkpoint_dir: str | None = None,
                         text_col: str = "text", id_col: str = "doc_id",
                         cjk_aware: bool = True,
                         passthrough: bool = False) -> DataFrame:
    """S6's REAL-model inference path, exercisable offline: load the
    vendored int8 word-vector checkpoint (a trained SGNS word2vec —
    tools/train_tiny_encoder.py; the reference only ever DECLARED its
    model, pyproject.toml:7-13 + scripts/model_download.sh:1), broadcast
    the weights, and run batched inference in mapInPandas.

    Document embedding = L2-normalized integer SUM of the tokens' int8
    vectors. Integer accumulation is ORDER-FREE (no float associativity),
    Σv² stays exact in float64 at any fixture scale, and the final
    divide/√/float32-round are scalar IEEE ops — which is why this path
    is hash-gated against a DuckDB all-SQL replay
    (queries_embed.text_embed_checkpoint) rather than rows-only. The
    quantization scale and the mean's 1/n both cancel under the L2 norm.

    Plan shape: map-only — JVM tokenization (single owner,
    mixed_tokens_expr), Arrow batches into NumPy, one V×dim int matrix
    broadcast per executor. No shuffle, no driver collect of corpus
    rows. Out-of-vocabulary tokens are skipped; a doc with no known
    tokens embeds as the zero vector (cosine(0, ·) = 0 store contract,
    same as the hashed-BoW tier)."""
    import numpy as np
    from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

    words, mat, dim = load_checkpoint(checkpoint_dir)
    w2i = {w: i for i, w in enumerate(words)}
    sc = docs.sparkSession.sparkContext
    b = sc.broadcast((w2i, mat))

    id_type = docs.schema[id_col].dataType
    emb_field = StructField("embedding", ArrayType(FloatType()))
    if passthrough:
        if "embedding" in docs.columns:
            raise ValueError(
                "checkpoint_embedding(passthrough=True) appends an "
                "'embedding' column but the input already has one")
        out_schema = StructType(list(docs.schema.fields) + [emb_field])
        keep = list(docs.columns)
    else:
        out_schema = StructType([StructField("vec_id", id_type), emb_field])
        keep = []
    toks = mixed_tokens_expr(text_col) if cjk_aware else tokens_expr(text_col)
    toks = F.coalesce(toks, F.array().cast("array<string>"))
    docs = widen_narrow_scan(docs)  # batched inference is the heavy part
    if passthrough:
        src = docs.select(*[F.col(c) for c in keep], toks.alias("_toks"))
    else:
        src = docs.select(F.col(id_col).alias("vec_id"), toks.alias("_toks"))

    def infer(batches):
        import math

        import pandas as pd

        w2i_l, mat_l = b.value
        zero = np.zeros(dim, dtype=np.float32)
        for pdf in batches:
            out = []
            for tok_arr in pdf["_toks"]:
                idxs = [w2i_l[t] for t in tok_arr if t in w2i_l]
                if not idxs:
                    out.append(zero)
                    continue
                s = mat_l[idxs].sum(axis=0)          # exact int64
                n2 = int((s * s).sum())              # exact, < 2^53
                if n2 == 0:
                    out.append(zero)
                    continue
                nrm = math.sqrt(float(n2))
                out.append((s / nrm).astype(np.float32))
            res = pdf.drop(columns=["_toks"]).copy()
            res["embedding"] = out
            yield res

    return src.mapInPandas(infer, out_schema)


# ---------------------------------------------------------------------------
# production slot: model-based embedding (stubbed — no model libs here)
# ---------------------------------------------------------------------------


def model_embedding(docs: DataFrame, model_name: str = "thenlper/gte-base-zh",
                    dim: int = 768, text_col: str = "text",
                    id_col: str = "doc_id", batch_size: int = 64) -> DataFrame:
    """Sentence-transformer embedding via mapInPandas (the reference's
    declared-but-never-called model, scripts/model_download.sh:1). One
    batched forward pass per Arrow batch; raises NotImplementedError when
    the model stack is absent (this container)."""
    try:
        import sentence_transformers  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "sentence-transformers not available in this environment; "
            "use hashed_bow_embedding for the deterministic pipeline"
        ) from e

    id_type = docs.schema[id_col].dataType.simpleString()
    out_schema = f"vec_id {id_type}, embedding array<float>"

    def embed(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer(model_name)
        for pdf in batches:
            vecs = model.encode(list(pdf[text_col]), batch_size=batch_size,
                                normalize_embeddings=True)
            yield pd.DataFrame({
                "vec_id": pdf[id_col].to_numpy(),
                "embedding": [v.astype("float32") for v in vecs],
            })

    return docs.select(id_col, text_col).mapInPandas(embed, out_schema)
