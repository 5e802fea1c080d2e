"""Engine facade — the one-import surface for reference users.

The reference's workflow is: list sources in raw_sources.yml → Airflow
loads them into BigQuery → dbt builds staging/dims/facts → dbt test
(README.md:41-48). The equivalent here is three calls:

    from etl_demos_spark.engine import Engine

    eng = Engine.local()                       # or Engine(existing_spark)
    eng.add_csv("customers", "data/customers.csv")
    eng.add_csv("loan_applications", "data/auto_loan_default.csv")
    eng.add_csv("payments", "data/payments.csv")
    built = eng.run_warehouse("/tmp/wh")       # 13 models + quality gate
    built["f_loan_contract"].show()

plus `eng.sql(...)` over every loaded source and built model, and
`eng.add_source_auto(...)` for the reference's EP3 schema-evolution path
(sniff → synonym-map → staged view + default assertions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_demos_spark.plans.bank_pipeline import build_bank_pipeline
from etl_demos_spark.session import configure_runtime, get_spark
from etl_demos_spark.sources.registry import Source, SourceRegistry, auto_adapt


class Engine:
    def __init__(self, spark: SparkSession):
        self.spark = configure_runtime(spark)
        self.registry = SourceRegistry()
        self._loaded: dict[str, DataFrame] = {}

    @classmethod
    def local(cls, app_name: str = "etl_demos_spark") -> "Engine":
        return cls(get_spark(app_name))

    # -- sources ----------------------------------------------------------
    def add_csv(self, name: str, path: str, **options) -> DataFrame:
        self.registry.add(Source(name=name, path=path, fmt="csv", options=options))
        return self._load(name)

    def add_parquet(self, name: str, path: str, **options) -> DataFrame:
        self.registry.add(Source(name=name, path=path, fmt="parquet", options=options))
        return self._load(name)

    def add_json(self, name: str, path: str, **options) -> DataFrame:
        self.registry.add(Source(name=name, path=path, fmt="json", options=options))
        return self._load(name)

    def add_sources_yaml(self, path: str) -> dict[str, DataFrame]:
        """raw_sources.yml-compatible registry file (S3)."""
        reg = SourceRegistry.from_yaml(path)
        for name, src in reg.sources.items():
            self.registry.add(src)
            self._load(name)
        return dict(self._loaded)

    def add_source_auto(
        self, name: str, path: str, persist_dir: str | None = None
    ) -> DataFrame:
        """EP3 self-extension: ingest an unknown CSV, synonym-map it onto
        the standard staging contract, register the staged view, and keep
        its generated not_null assertions.

        With ``persist_dir``, the integration also survives a restart
        (integrate_new_dataset.py:113-242): the raw source is appended
        idempotently to ``<dir>/raw_sources.yml`` and the staged model's
        default not_null tests are upserted into ``<dir>/staging.yml``.
        A fresh Engine re-arms with ``rearm_from_dir(persist_dir)`` —
        raw views, staged views AND their assertions come back."""
        raw = self.add_csv(f"{name}_raw", path)
        staged, assertions = auto_adapt(raw)
        staged.createOrReplaceTempView(name)
        self._loaded[name] = staged
        self._auto_assertions = getattr(self, "_auto_assertions", []) + [
            (name, kind, cols) for (_m, kind, cols) in assertions
        ]
        if persist_dir is not None:
            from pathlib import Path

            from etl_demos_spark.sources.registry import upsert_staging_yaml

            d = Path(persist_dir)
            self.registry.to_yaml(str(d / "raw_sources.yml"))
            key_cols = tuple(
                c for (_m, kind, cols) in assertions if kind == "not_null" for c in cols
            )
            upsert_staging_yaml(
                str(d / "staging.yml"),
                source_name=f"{name}_raw",
                model_name=name,
                key_columns=key_cols or ("loan_id", "customer_id"),
            )
        return staged

    def rearm_from_dir(self, persist_dir: str) -> dict[str, DataFrame]:
        """Restart path for add_source_auto persistence: reload
        ``raw_sources.yml`` (raw views), then rebuild every staged model
        named in ``staging.yml`` — synonym-map its ``<model>_raw`` source
        through auto_adapt, re-register the staged view, and re-arm its
        persisted not_null assertions. Without this, only raw views
        came back and the documented restart workflow died with
        TABLE_OR_VIEW_NOT_FOUND on the staged name."""
        from pathlib import Path

        from etl_demos_spark.sources.registry import (
            staging_assertions_from_yaml,
        )

        d = Path(persist_dir)
        out = self.add_sources_yaml(str(d / "raw_sources.yml"))
        staging = d / "staging.yml"
        if staging.exists():
            assertions = staging_assertions_from_yaml(str(staging))
            rearmed = {name for name, _k, _c in assertions}
            for name in rearmed:
                raw_name = f"{name}_raw"
                if raw_name not in self._loaded:
                    continue
                staged, _ = auto_adapt(self._loaded[raw_name])
                staged.createOrReplaceTempView(name)
                self._loaded[name] = staged
                out[name] = staged
            self._auto_assertions = getattr(self, "_auto_assertions", []) + [
                a for a in assertions if a[0] in rearmed
            ]
        return out

    def check_quality(self) -> list[str]:
        """Run every accumulated auto-generated assertion (the
        add_source_auto / rearm_from_dir not_null contracts) against the
        current staged views; returns failure strings (empty = green).
        This is the consumer the _auto_assertions state existed for —
        the dbt-test step of the EP3 workflow."""
        from etl_demos_spark.plans.quality import run_assertions

        return run_assertions(
            self._loaded, getattr(self, "_auto_assertions", [])
        )

    def _load(self, name: str) -> DataFrame:
        df = self.registry.load(self.spark, name)
        df.createOrReplaceTempView(name)
        self._loaded[name] = df
        return df

    # -- query ------------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self._loaded[name]

    # -- warehouse --------------------------------------------------------
    def run_warehouse(self, warehouse_dir: str, check: bool = True) -> dict[str, DataFrame]:
        """Build the full 13-model bank warehouse from the loaded sources
        (requires: customers, loan_applications, payments)."""
        pipeline = build_bank_pipeline(warehouse_dir=warehouse_dir)
        built = pipeline.run(self.spark, self._loaded, check=check)
        for name, df in built.items():
            df.createOrReplaceTempView(name)
            self._loaded[name] = df
        return built

    # -- training-data corpus --------------------------------------------
    def corpus(
        self, df_or_name, id_col: str = "doc_id", text_col: str = "text"
    ) -> "Corpus":
        """Corpus facade over a DataFrame or a loaded source name."""
        df = (
            df_or_name
            if isinstance(df_or_name, DataFrame)
            else self.table(df_or_name)
        )
        return Corpus(df, id_col, text_col)

    def vectors(
        self, df_or_name, id_col: str = "vec_id", vec_col: str = "embedding"
    ) -> "Vectors":
        """Vectors facade over a DataFrame or a loaded source name."""
        df = (
            df_or_name
            if isinstance(df_or_name, DataFrame)
            else self.table(df_or_name)
        )
        return Vectors(df, id_col, vec_col)

    def media(
        self, df_or_name, id_col: str = "id", content_col: str = "content"
    ) -> "Media":
        """Media facade over a binary-payload DataFrame or source name."""
        df = (
            df_or_name
            if isinstance(df_or_name, DataFrame)
            else self.table(df_or_name)
        )
        return Media(df, id_col, content_col)

    def events(
        self,
        df_or_name,
        ts_col: str = "ts",
        user_col: str = "user_id",
        event_col: str = "event_type",
    ) -> "Events":
        """Events facade over a DataFrame or a loaded source name."""
        df = (
            df_or_name
            if isinstance(df_or_name, DataFrame)
            else self.table(df_or_name)
        )
        return Events(df, ts_col, user_col, event_col)


class Corpus:
    """Training-data facade over a documents DataFrame — one
    discoverable surface for the dedup / quality / tokenize / search /
    export operators (each delegates to its operators/ module, where
    the scale notes live).

        corpus = Engine.local().corpus(docs)          # or corpus("name")
        clean = corpus.dedup_near(threshold=0.8)
        scored = corpus.quality()
        merges = corpus.learn_bpe(n_merges=1000)
    """

    def __init__(self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
        self.df = df
        self.id_col = id_col
        self.text_col = text_col

    def _with(self, df: DataFrame) -> "Corpus":
        return Corpus(df, self.id_col, self.text_col)

    # -- dedup ------------------------------------------------------------
    def dedup_exact(self) -> "Corpus":
        from etl_demos_spark.operators.dedup import exact_dedup

        return self._with(exact_dedup(self.df, self.text_col, self.id_col))

    def dedup_near(self, threshold: float = 0.5, **kw) -> "Corpus":
        from etl_demos_spark.operators.dedup import dedup_by_minhash

        return self._with(
            dedup_by_minhash(
                self.df, self.id_col, self.text_col, threshold=threshold, **kw
            )
        )

    def dedup_incremental(self, store: DataFrame | None, threshold: float = 0.5):
        """→ (kept_ids, updated_signature_store) — see
        operators/dedup.incremental_minhash_dedup."""
        from etl_demos_spark.operators.dedup import incremental_minhash_dedup

        return incremental_minhash_dedup(
            self.df, store, self.id_col, self.text_col, threshold=threshold
        )

    def dedup_chunks(self, w: int = 3, mask: int = 16) -> DataFrame:
        """Keep-first sub-document dedup at content-defined chunk
        granularity (rsync/FastCDC boundaries — robust to insertions,
        unlike fixed windows). Returns (id, clean_text, kept_tokens,
        removed_tokens) for every doc — see
        operators/dedup.remove_duplicated_cdc_chunks."""
        from etl_demos_spark.operators.dedup import remove_duplicated_cdc_chunks

        return remove_duplicated_cdc_chunks(
            self.df, self.id_col, self.text_col, w, mask
        )

    def chunk_duplication_report(self, w: int = 3, mask: int = 16) -> DataFrame:
        """(chunk_fp, n_copies, n_docs, chunk_tokens) for every
        content-defined chunk occurring more than once — see
        operators/dedup.cdc_duplicate_chunks."""
        from etl_demos_spark.operators.dedup import cdc_duplicate_chunks

        return cdc_duplicate_chunks(self.df, self.id_col, self.text_col, w, mask)

    # -- host/domain curation + versioning --------------------------------
    def host_rollup(self, host_col: str = "source", **kw) -> DataFrame:
        """Per-host duplication profile with keep/review/drop verdict —
        see operators/domains.host_dedup_rollup."""
        from etl_demos_spark.operators.domains import host_dedup_rollup

        return host_dedup_rollup(
            self.df, host_col, self.id_col, self.text_col, **kw
        )

    def host_mirrors(self, host_col: str = "source", **kw) -> DataFrame:
        """Host pairs ranked by shared chunk fingerprints (mirror /
        syndication detection) — see operators/domains.host_mirror_pairs."""
        from etl_demos_spark.operators.domains import host_mirror_pairs

        return host_mirror_pairs(
            self.df, host_col, self.id_col, self.text_col, **kw
        )

    def diff_snapshot(self, new: "Corpus | DataFrame", **kw) -> DataFrame:
        """Per-document CDC chunk diff against a newer snapshot of this
        corpus — see operators/versioning.snapshot_chunk_diff."""
        from etl_demos_spark.operators.versioning import snapshot_chunk_diff

        new_df = new.df if isinstance(new, Corpus) else new
        return snapshot_chunk_diff(
            self.df, new_df, self.id_col, self.text_col, **kw
        )

    # -- quality / text ---------------------------------------------------
    def quality(self) -> DataFrame:
        from etl_demos_spark.operators.text import lang_guess, quality_score

        return self.df.select(
            self.id_col,
            quality_score(self.text_col).alias("quality"),
            lang_guess(self.text_col).alias("lang_guess"),
        )

    def decontaminate(self, eval_df: DataFrame, n: int = 3) -> "Corpus":
        from etl_demos_spark.operators.trainprep import decontaminate

        return self._with(
            decontaminate(self.df, eval_df, self.id_col, self.text_col, n)
        )

    # -- tokenizer --------------------------------------------------------
    def learn_bpe(self, n_merges: int = 1000) -> list[tuple[str, str]]:
        from etl_demos_spark.operators.bpe import learn_bpe_merges

        return learn_bpe_merges(self.df, self.text_col, n_merges)

    def encode_bpe(self, merges: list[tuple[str, str]]) -> DataFrame:
        from etl_demos_spark.operators.bpe import apply_merges

        return apply_merges(self.df, merges, self.text_col)

    # -- search -----------------------------------------------------------
    def search(self, terms: list[str], k: int = 10) -> DataFrame:
        from etl_demos_spark.operators.search import (
            bm25_search,
            build_term_index,
            doc_lengths,
        )

        idx = build_term_index(self.df, self.id_col, self.text_col)
        lens = doc_lengths(self.df, self.id_col, self.text_col)
        return bm25_search(idx, lens, terms, self.id_col, k)

    # -- export -----------------------------------------------------------
    def export_shards(self, path: str, n_shards: int, seed: str = "epoch0") -> None:
        from etl_demos_spark.operators.trainprep import write_training_shards

        write_training_shards(self.df, path, n_shards, self.id_col, seed)




class Vectors:
    """Embedding-corpus facade — the similarity-search / semantic-dedup
    surface (delegates to operators/similarity, embeddings,
    embedding_dedup, pq; scale notes live there).

        vecs = Engine.local().vectors(embeddings_df)
        hits = vecs.topk(query_vec, k=10)           # exact baseline
        books, codes = vecs.pq_compress(m=8, k=256) # 32× smaller index
        clean = vecs.dedup(threshold=0.95)
    """

    def __init__(self, df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"):
        self.df = df
        self.id_col = id_col
        self.vec_col = vec_col

    def _queries_df(self, query) -> DataFrame:
        """Accept a single vector (list) or a (query_id, query_vec) df."""
        if isinstance(query, DataFrame):
            return query
        return self.df.sparkSession.createDataFrame(
            [(0, [float(x) for x in query])],
            "query_id long, query_vec array<float>",
        )

    def topk(self, query, k: int = 10) -> DataFrame:
        from etl_demos_spark.operators.similarity import brute_force_topk

        return brute_force_topk(
            self.df, self._queries_df(query), k, self.id_col, self.vec_col
        )

    def topk_lsh(self, query, k: int = 10, n_planes: int = 8, seed: int = 7, **kw) -> DataFrame:
        """ANN via random-hyperplane LSH; planes are seed-deterministic
        (pass planes=... to reuse a fixed family)."""
        import numpy as np

        from etl_demos_spark.operators.similarity import ann_topk_lsh

        planes = kw.pop("planes", None)
        if planes is None:
            dim = len(self.df.select(self.vec_col).first()[0])
            planes = (
                np.random.default_rng(seed).standard_normal((n_planes, dim)).tolist()
            )
        return ann_topk_lsh(
            self.df, self._queries_df(query), planes, k,
            self.id_col, self.vec_col, **kw
        )

    def pq_compress(self, m: int = 8, k: int = 256, **kw):
        """→ (codebooks, codes_df) — FAISS-style product quantization."""
        from etl_demos_spark.operators.pq import pq_encode, pq_train

        books = pq_train(self.df, m, k, id_col=self.id_col, vec_col=self.vec_col, **kw)
        return books, pq_encode(self.df, books, self.id_col, self.vec_col)

    def pq_search(self, codes: DataFrame, books, query, k: int = 10, rerank: bool = True) -> DataFrame:
        from etl_demos_spark.operators.pq import pq_search_adc

        return pq_search_adc(
            codes, books, query, k, self.id_col,
            rerank_df=self.df if rerank else None, vec_col=self.vec_col,
        )

    def dedup(self, threshold: float = 0.95) -> DataFrame:
        from etl_demos_spark.operators.embedding_dedup import dedup_by_embedding

        return dedup_by_embedding(self.df, self.id_col, self.vec_col, threshold)

    def semantic_dedup(self, centroids_df: DataFrame, threshold: float = 0.9) -> DataFrame:
        from etl_demos_spark.operators.embedding_dedup import semantic_dedup

        return semantic_dedup(
            self.df, centroids_df, self.id_col, self.vec_col, threshold
        )

    def kmeans(self, k: int = 8, iters: int = 5):
        """→ (centroids, assignments) — distributed Lloyd."""
        from etl_demos_spark.operators.embeddings import kmeans_lloyd

        return kmeans_lloyd(self.df, k, iters, self.id_col, self.vec_col)


class Media:
    """Multimodal facade over a binary-payload DataFrame — the
    decode / featurize / perceptual-dedup operators behind one
    discoverable surface (each method delegates to operators/multimodal
    or operators/image_dedup, where the codec boundaries and scale
    notes live).

        media = Engine.local().media(images_df)   # (id, content binary)
        media.image_meta()                        # real header decode
        media.dedup()                             # dHash + keep-one
        kept, store = media.dedup_incremental(store)
        media.audio_features()                    # WAV PCM decode
        media.video_meta()                        # AVI container walk
    """

    def __init__(self, df: DataFrame, id_col: str = "id", content_col: str = "content"):
        self.df = df
        self.id_col = id_col
        self.content_col = content_col

    def _normalized(self) -> DataFrame:
        import pyspark.sql.functions as F

        if self.id_col == "id" and self.content_col == "content":
            return self.df
        return self.df.select(
            F.col(self.id_col).alias("id"),
            F.col(self.content_col).alias("content"),
        )

    # -- images -----------------------------------------------------------
    def image_meta(self) -> DataFrame:
        """→ (id, n_bytes, sha, width, height, mode) via real codecs."""
        from etl_demos_spark.operators.multimodal import extract_image_meta

        return extract_image_meta(self._normalized())

    def image_stats(self) -> DataFrame:
        """→ per-channel pixel mean/std (decode→featurize pass)."""
        from etl_demos_spark.operators.multimodal import image_channel_stats

        return image_channel_stats(self._normalized())

    def signatures(self, algo: str = "dhash") -> DataFrame:
        """→ (id, sig) perceptual hashes (dhash | phash)."""
        from etl_demos_spark.operators.image_dedup import image_signatures

        return image_signatures(self._normalized(), algo)

    def near_dups(self, algo: str = "dhash", max_hamming: int = 4) -> DataFrame:
        """→ (id_a, id_b, hamming) within the Hamming ball — banded
        pigeonhole join, never all-pairs."""
        from etl_demos_spark.operators.image_dedup import image_near_dup_pairs

        return image_near_dup_pairs(self._normalized(), algo, max_hamming)

    def dedup(
        self, algo: str = "dhash", max_hamming: int = 4, prefer=None
    ) -> "Media":
        """Perceptual keep-one-per-cluster → Media of survivors."""
        from etl_demos_spark.operators.image_dedup import dedup_by_image_hash

        kept = dedup_by_image_hash(
            self._normalized(), algo, max_hamming, prefer=prefer
        )
        return Media(kept, "id", "content")

    def dedup_incremental(
        self,
        store: DataFrame | None,
        algo: str = "dhash",
        max_hamming: int = 0,
    ):
        """→ (kept_new_ids, updated_store) — probe a persisted
        signature store; prior payloads are never re-decoded."""
        from etl_demos_spark.operators.image_dedup import incremental_image_dedup

        return incremental_image_dedup(self._normalized(), store, algo, max_hamming)

    def resize(self, w: int, h: int) -> DataFrame:
        from etl_demos_spark.operators.multimodal import resize_images

        return resize_images(self._normalized(), w, h)

    # -- audio / video ------------------------------------------------------
    def audio_features(self) -> DataFrame:
        """→ (id, sample_rate, channels, bits, n_frames, duration_ms,
        peak, sumsq, rms) via the in-repo WAV PCM decoder."""
        from etl_demos_spark.operators.multimodal import audio_features

        return audio_features(self._normalized())

    def audio_fingerprints(self) -> DataFrame:
        """→ (id, sig) 63-bit energy-gradient fingerprints."""
        from etl_demos_spark.operators.audio_dedup import audio_fp_signatures

        return audio_fp_signatures(self._normalized())

    def audio_near_dups(self, max_hamming: int = 4) -> DataFrame:
        """→ (id_a, id_b, hamming) perceptual audio near-dups via the
        shared banded Hamming join."""
        from etl_demos_spark.operators.audio_dedup import audio_near_dup_pairs

        return audio_near_dup_pairs(self._normalized(), max_hamming)

    def video_meta(self) -> DataFrame:
        """→ avih header fields + movi frame census via the nested
        RIFF container walk."""
        from etl_demos_spark.operators.multimodal import video_meta

        return video_meta(self._normalized())

    def video_frame_signatures(self, algo: str = "dhash") -> DataFrame:
        """→ (id, frame_idx, n_frames, sig) — per-frame perceptual
        hashes over decodable AVI frame payloads."""
        from etl_demos_spark.operators.video_dedup import video_frame_signatures

        return video_frame_signatures(self._normalized(), algo)

    def video_near_dups(
        self, algo: str = "dhash", max_hamming: int = 4
    ) -> DataFrame:
        """→ (id_a, id_b, n_frames, total_hamming): same frame count,
        every aligned frame within the per-frame Hamming ball — the
        frame-aligned banded join."""
        from etl_demos_spark.operators.video_dedup import video_near_dup_pairs

        return video_near_dup_pairs(self._normalized(), algo, max_hamming)

    def video_fingerprints(self) -> DataFrame:
        """→ (id, n_frames, fp) exact container fingerprints (SHA-256
        over the ordered frame-digest concatenation) — the opaque-codec
        fallback."""
        from etl_demos_spark.operators.video_dedup import video_exact_fingerprints

        return video_exact_fingerprints(self._normalized())

    def video_dedup(self, algo: str = "dhash", max_hamming: int = 4) -> "Media":
        """Perceptual keep-one-per-cluster over videos → Media of
        survivors."""
        from etl_demos_spark.operators.video_dedup import dedup_videos

        kept = dedup_videos(self._normalized(), algo, max_hamming)
        return Media(kept, "id", "content")

    def video_dedup_incremental(self, store: DataFrame | None):
        """→ (kept_new_ids, updated_store) — probe a persisted exact
        fingerprint store; prior payloads are never re-walked."""
        from etl_demos_spark.operators.video_dedup import incremental_video_dedup

        return incremental_video_dedup(self._normalized(), store)


class Events:
    """Event-analytics facade over an event-stream DataFrame — the
    funnel family behind one discoverable surface (each method delegates
    to its operators/streaming module, where the scale notes live).

        ev = Engine.local().events(events_df)     # or events("name")
        ev.funnel("view", "click", "purchase")    # first-occurrence funnel
        ev.first_response("view", "purchase", within="2 hours")
        ev.sessionize(gap="30 minutes")
        ev.transitions()                          # Markov next-event counts

    The funnel counts each user once per stage via first occurrences;
    ``first_response`` pairs EVERY "A" event with its earliest "B"
    within the bound (conversion latency — what the funnel can't
    express). ``first_response_stream`` is the Structured Streaming
    twin, equality-tested against the batch join."""

    def __init__(
        self,
        df: DataFrame,
        ts_col: str = "ts",
        user_col: str = "user_id",
        event_col: str = "event_type",
    ):
        self.df = df
        self.ts_col, self.user_col, self.event_col = ts_col, user_col, event_col

    def funnel(self, *steps: str) -> DataFrame:
        """Ordered first-occurrence funnel: one conditional-min
        aggregation pass per user, then stage predicates — no joins, no
        windows, one keyed shuffle (the q_event_funnel plan). Returns
        one row per stage with the user count that reached it in order."""
        import pyspark.sql.functions as F

        if len(steps) < 2:
            raise ValueError("funnel needs at least two steps")
        firsts = self.df.groupBy(self.user_col).agg(
            *[
                F.min(
                    F.when(F.col(self.event_col) == s, F.col(self.ts_col))
                ).alias(f"__t{i}")
                for i, s in enumerate(steps)
            ]
        )
        reached = F.col("__t0").isNotNull()
        preds = [reached]
        for i in range(1, len(steps)):
            reached = reached & (F.col(f"__t{i}") > F.col(f"__t{i-1}"))
            preds.append(reached)
        counts = firsts.agg(
            *[
                # coalesce: sum over an empty frame is NULL, and a
                # 0-user stage must count as 0, not None
                F.coalesce(F.sum(p.cast("long")), F.lit(0).cast("long")).alias(
                    f"__n{i}"
                )
                for i, p in enumerate(preds)
            ]
        )
        rows = [
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(s).alias("step"),
                F.col(f"__n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
        return counts.select(
            F.explode(F.array(*rows)).alias("r")
        ).select("r.stage", "r.step", "r.n_users")

    def first_response(self, first: str, then: str, within: str = "2 hours") -> DataFrame:
        """→ (user, a_ts, b_ts): every ``first`` event paired with its
        EARLIEST ``then`` within the bound (operators/asof)."""
        from etl_demos_spark.operators.asof import first_response_join

        return first_response_join(
            self.df, (self.user_col,), self.ts_col, self.event_col,
            first, then, within,
        )

    def first_response_stream(
        self, stream_df: DataFrame, first: str, then: str, within: str = "2 hours"
    ) -> DataFrame:
        """Streaming twin of :meth:`first_response` — per-key state
        machine under applyInPandasWithState; see
        streaming/stateful.stream_first_response for the at-arrival
        semantics and state bounds."""
        from etl_demos_spark.streaming.stateful import stream_first_response

        return stream_first_response(
            stream_df, first, then, within,
            ts_col=self.ts_col, user_col=self.user_col, event_col=self.event_col,
        )

    def sessionize(self, gap: str = "30 minutes", order_tiebreak: str = "event_id") -> DataFrame:
        """Gap-based sessions (lag → flag → cumulative sum)."""
        from etl_demos_spark.streaming.windows import sessionize_batch

        return sessionize_batch(
            self.df, self.ts_col, self.user_col, gap, order_tiebreak
        )

    def transitions(self, order_tiebreak: str = "event_id") -> DataFrame:
        """First-order Markov next-event counts + conditional
        probabilities per user sequence (operators/cooccur)."""
        from etl_demos_spark.operators.cooccur import transition_counts

        return transition_counts(
            self.df, self.user_col, (self.ts_col, order_tiebreak), self.event_col
        )
