"""Enrichment operators: geocoding and sentence embeddings.

Reference behaviors re-expressed set-oriented:

- **Geocode** (U4/S12/P9, /root/reference/src/shared/services/
  gcp_geocoding_service.py:29-89): only rows passing the ``needs_geocoding``
  staleness predicate hit the (expensive) geocoder; everything else rides a
  cache-table left-join. Failures/misses degrade to the reference's default
  New Orleans coordinates — never poison the pipeline.
- **Embeddings** (U1-U3, /root/reference/src/loader/service.py:42-257):
  deterministic text assembly (functions/scalar.py F18) feeding a batched
  encoder; only-if-null incremental semantics (filter → encode → union
  back); encode failure → null embedding, row survives.

The encoder/geocoder themselves are pluggable callables run inside
Arrow-batched ``mapInPandas`` (the only sane shape for model inference at
scale: one model load per executor, thousands of rows per batch). Real
backends (sentence-transformers, Google Geocoding) are not in this
container, so the default implementations are STUBS — deterministic
hash-derived fakes with the same signatures, so the distributed plumbing is
real and testable; swap the callable for the real model in deployment.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    StringType,
    StructField,
    StructType,
)

from ..functions.scalar import needs_geocoding

DEFAULT_COORDS = (29.9511, -90.0715)  # reference configs.py:38-41
EMBED_DIM = 384  # all-MiniLM-L6-v2 dimensionality, reference models.py:227


# --- stub backends (deterministic; replace in deployment) ------------------


def fake_geocode_batch(addresses: pd.Series) -> pd.DataFrame:
    """Deterministic pseudo-geocoder: coordinates derived from an md5 of the
    address, bounded to the New Orleans metro box; empty/null → defaults."""
    import hashlib

    lats, lons = [], []
    for a in addresses:
        if not a or not str(a).strip():
            lats.append(DEFAULT_COORDS[0])
            lons.append(DEFAULT_COORDS[1])
            continue
        h = int(hashlib.md5(str(a).encode()).hexdigest()[:12], 16)
        lats.append(29.85 + (h % 1000) / 5000.0)
        lons.append(-90.2 + ((h >> 10) % 1000) / 2500.0)
    return pd.DataFrame({"latitude": lats, "longitude": lons})


def fake_embed_batch(texts: pd.Series) -> pd.Series:
    """Deterministic pseudo-encoder: 384-dim unit vector seeded from md5 of
    the text; empty/null → None (the reference's degrade-to-null)."""
    import hashlib

    out = []
    for t in texts:
        if t is None or not str(t).strip():
            out.append(None)
            continue
        h = hashlib.md5(str(t).encode()).digest()
        vals = [((h[i % 16] * 31 + i * 7) % 255) / 127.5 - 1.0 for i in range(EMBED_DIM)]
        n = math.sqrt(sum(v * v for v in vals)) or 1.0
        out.append([float(v / n) for v in vals])
    return pd.Series(out)


# Per-worker sentence-transformers cache (see encode() inside the factory).
_ST_MODELS: dict[str, object] = {}


def real_embed_batch_factory(
    model_name: str = "all-MiniLM-L6-v2",
) -> Callable[[pd.Series], pd.Series] | None:
    """Sentence-transformers seam (reference src/loader/service.py:42-52):
    returns a batched encoder closure when the package is importable, else
    None — the caller falls back to the deterministic stub. The model loads
    LAZILY, ONCE per executor worker process, inside the closure (the only
    sane shape for model inference under mapInPandas: amortize the load
    across every Arrow batch the worker sees). Vectors are L2-normalized to
    match the reference's cosine-ready storage; null/empty text degrades to
    null exactly like the stub (service.py:77-83)."""
    try:
        import sentence_transformers  # noqa: F401
    except ImportError:
        return None

    def encode(texts: pd.Series) -> pd.Series:
        from sentence_transformers import SentenceTransformer

        from fest_vibes_ai_etl_spark.operators import enrich as _mod

        # Module-level cache: a closure dict rides the task pickle and would
        # reload the model per task; the module global survives Python
        # worker reuse (same fix as rerank._CE_MODELS).
        model = _mod._ST_MODELS.get(model_name)
        if model is None:
            model = _mod._ST_MODELS[model_name] = SentenceTransformer(model_name)
        out = pd.Series([None] * len(texts), index=texts.index, dtype=object)
        mask = texts.notna() & texts.astype(str).str.strip().ne("")
        if mask.any():
            vecs = model.encode(
                texts[mask].astype(str).tolist(), normalize_embeddings=True
            )
            # index-aligned object Series: a plain list-of-lists assignment
            # would be broadcast element-wise by pandas and flatten the rows
            out[mask] = pd.Series(
                [[float(x) for x in v] for v in vecs],
                index=texts.index[mask],
                dtype=object,
            )
        return out

    return encode


def default_encoder() -> Callable[[pd.Series], pd.Series]:
    """The engine's embedding backend: the real sentence-transformers
    encoder when the package is present (drop-in real outside this
    sandbox), the deterministic stub otherwise. Parity tests pin the stub;
    the seam itself is tested both ways via dependency injection."""
    return real_embed_batch_factory() or fake_embed_batch


# --- geocode with cache gating ---------------------------------------------


def geocode_with_cache(
    venues: DataFrame,
    cache: DataFrame | None = None,
    geocoder: Callable[[pd.Series], pd.DataFrame] = fake_geocode_batch,
    stale_days: int = 30,
) -> DataFrame:
    """Fill latitude/longitude on a venues DataFrame:

    1. left-join the geocode cache table on full_address (cache hits never
       call the geocoder — the reference's existence-check optimization);
    2. rows still failing ``needs_geocoding`` keep their values;
    3. the remaining (small) subset runs the batched geocoder UDF;
    4. union back; ``last_geocoded`` stamped on refreshed rows.

    Columns required: full_address, latitude, longitude, last_geocoded.
    """
    df = venues
    if cache is not None:
        c = cache.select(
            F.col("full_address").alias("__ca"),
            F.col("latitude").alias("__clat"),
            F.col("longitude").alias("__clon"),
        )
        df = (
            df.join(F.broadcast(c), df.full_address == F.col("__ca"), "left")
            .withColumn("latitude", F.coalesce("__clat", "latitude"))
            .withColumn("longitude", F.coalesce("__clon", "longitude"))
            .withColumn(
                "last_geocoded",
                F.when(F.col("__clat").isNotNull(), F.current_timestamp()).otherwise(
                    F.col("last_geocoded")
                ),
            )
            .drop("__ca", "__clat", "__clon")
        )

    pred = needs_geocoding(
        F.col("latitude"), F.col("longitude"), F.col("last_geocoded"), stale_days
    )
    fresh = df.filter(~pred)
    stale = df.filter(pred)

    schema = StructType(
        [StructField("full_address", StringType())]
        + [StructField("latitude", DoubleType()), StructField("longitude", DoubleType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            coords = geocoder(pdf["full_address"])
            yield pd.DataFrame(
                {
                    "full_address": pdf["full_address"],
                    "latitude": coords["latitude"],
                    "longitude": coords["longitude"],
                }
            )

    # Geocode each distinct address once (the crawl-memoization optimization,
    # set-oriented), then re-join onto the stale rows.
    addr_coords = (
        stale.select("full_address").distinct().mapInPandas(run, schema=schema)
    )
    refreshed = (
        stale.drop("latitude", "longitude")
        .join(F.broadcast(addr_coords), "full_address", "left")
        .withColumn("latitude", F.coalesce("latitude", F.lit(DEFAULT_COORDS[0])))
        .withColumn("longitude", F.coalesce("longitude", F.lit(DEFAULT_COORDS[1])))
        .withColumn("last_geocoded", F.current_timestamp())
    )
    return fresh.unionByName(refreshed.select(*fresh.columns))


# --- embeddings with only-if-null backfill ---------------------------------


def embed_column(
    df: DataFrame,
    text_col: str,
    out_col: str,
    encoder: Callable[[pd.Series], pd.Series] = fake_embed_batch,
    only_if_null: bool = True,
) -> DataFrame:
    """Attach an embedding column computed from ``text_col``.

    ``only_if_null=True`` reproduces the reference's incremental semantics
    (U3/P10): rows with an existing embedding skip inference entirely —
    filter → encode the miss subset → union back. At scale this is the
    difference between embedding 100 TB nightly and embedding the delta."""
    has_out = out_col in df.columns
    if not has_out:
        df = df.withColumn(out_col, F.lit(None).cast(ArrayType(FloatType())))

    if only_if_null:
        todo = df.filter(F.col(out_col).isNull())
        done = df.filter(F.col(out_col).isNotNull())
    else:
        todo, done = df, None

    out_schema = StructType(
        [*todo.schema.fields]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            try:
                pdf[out_col] = encoder(pdf[text_col])
            except Exception:
                pdf[out_col] = None  # degrade-to-null, reference service.py:77-83
            yield pdf

    encoded = todo.mapInPandas(run, schema=out_schema)
    return encoded if done is None else done.unionByName(encoded)
