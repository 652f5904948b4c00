"""End-to-end corpus curation: the training-data pipeline composed.

raw pages ──extract──► text ──quality──► filter ──exact dedup──►
──near-dup (MinHash-LSH)──► ──balanced sample──► train/val split

Each stage is one of this package's operators; this module only wires
them, in the order a real pretraining-data pipeline runs them.  Every
stage is a narrow projection + one keyed shuffle, so the composition
inherits the per-stage scale properties (nothing here is new physics).

Stage semantics:
- quality gate: token count ≥ min_tokens and quality_score ≥ min_score
  (D3-family features, text_analysis.quality_score);
- exact dedup: keep the smallest url per normalized-text fingerprint;
- near-dup: MinHash+LSH candidate pairs (3-word shingles); the
  lexicographically larger url of each pair is dropped — deterministic
  keep policy;
- balanced sample: ≤ n_per_lang docs per language (W4, the reference's
  50k-per-source train set policy, datasets/README.md "v2_50k");
- split: seeded randomSplit (W3, ocr_datamodule.py:90-96).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from . import stages


def curate(
    extracted: DataFrame,
    *,
    min_tokens: int = 20,
    min_score: float = 0.3,
    n_per_lang: int = 10_000,
    split_weights: tuple[float, float] = (0.8, 0.2),
    seed: int = 42,
) -> dict[str, DataFrame]:
    """Curate an extracted corpus (url, lang, text, n_blocks, error).

    Returns {"curated", "train", "val", "stats"} DataFrames; all
    deterministic given the input and seed.
    """
    # EVERY stage — drop_errors → quality_gate → exact_dedup →
    # neardup_lsh → balanced_sample → project_curated → split/stats —
    # runs through the config-driven stage registry (the complete
    # Hydra `_target_` composition analog); the pipeline IS this
    # config (stages.full_curate_config), rewireable in data.
    cfg = stages.full_curate_config(
        min_tokens=min_tokens,
        min_score=min_score,
        n_per_lang=n_per_lang,
        split_weights=split_weights,
        seed=seed,
    )
    # persist: four returned frames (curated/train/val/stats) share this
    # subtree — without a cache every downstream action re-runs the whole
    # extraction+dedup DAG (the shared-UDF-subtree re-evaluation rule).
    # The curated set is narrow and post-sampling, so this is the one
    # place caching is cheap and correct even at scale.
    curated = stages.run_pipeline(extracted, cfg["curated"]).persist()
    return {
        "curated": curated,
        "train": stages.run_pipeline(curated, cfg["train"]),
        "val": stages.run_pipeline(curated, cfg["val"]),
        "stats": stages.run_pipeline(curated, cfg["stats"]),
    }
