"""pyvectorsearch_spark — a PySpark-native analytics engine with the query
capabilities of the reference library sitmo/pyvectorsearch (an exact k-NN /
range-search spatial index, ``/root/reference/include/pktree.hpp``), rebuilt
Spark-first and extended with the operators a large-scale training-data
pipeline needs (dedup, similarity search, text analysis, multimodal columns).

Design principles (see SURVEY.md):

- DataFrame/SQL declarative plans; Catalyst handles pushdown/pruning/codegen.
- Vector math as native columnar expressions (``zip_with`` + ``aggregate``),
  never row-at-a-time Python UDFs; numpy-backed ``mapInPandas`` only for the
  blocked top-k fast path where a matrix multiply genuinely wins.
- The PK-tree index (reference ``include/pktree.hpp:300-311``) becomes a
  closed-form grid ``cell_id`` column + partitioned Parquet + a tiny cell-stats
  table — no pointer tree, any executor computes any cell id with zero
  communication.
"""

__version__ = "0.1.0"

from pyvectorsearch_spark.api import (  # noqa: F401
    IVFIndex,
    IVFPQIndex,
    SQ8Index,
    VectorIndex,
    knn_bruteforce,
    range_bruteforce,
    topk_global,
)
from pyvectorsearch_spark.session import get_spark  # noqa: F401

# Curation-pipeline surface (the training-data extensions; each function is
# documented in its operators/ module and oracle-checked via __spark_entry__).
from pyvectorsearch_spark.operators.dedup import (  # noqa: F401
    embedding_dup_pairs_bucketed,
    exact_dedup,
    jaccard_similarity_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
    simhash_pairs_bucketed,
)
from pyvectorsearch_spark.operators.embeddings import (  # noqa: F401
    centroid_drift,
    centroid_outliers,
    label_centroids,
)
from pyvectorsearch_spark.operators.funnel import (  # noqa: F401
    funnel_conversion,
    retention_cohorts,
)
from pyvectorsearch_spark.operators.layout import (  # noqa: F401
    zorder_key,
    zorder_layout_stats,
)
from pyvectorsearch_spark.operators.quality import (  # noqa: F401
    profile_table,
    psi_drift,
    winsorize_stats,
)
from pyvectorsearch_spark.operators.graph import (  # noqa: F401
    connected_components,
    label_propagation,
    pagerank,
    triangle_stats,
)
from pyvectorsearch_spark.operators.incremental import merge_rollups  # noqa: F401
from pyvectorsearch_spark.operators.sampling import (  # noqa: F401
    sample_weighted_k,
    select_token_budget,
    shuffle_deterministic,
)
from pyvectorsearch_spark.operators.scd import scd2_merge  # noqa: F401
from pyvectorsearch_spark.operators.timeseries import (  # noqa: F401
    interpolate_gaps,
    resample_counts,
)
from pyvectorsearch_spark.operators.sketches import (  # noqa: F401
    cms_build,
    cms_lookup,
    hist_quantiles,
    kmv_distinct,
    quantile_bins,
)
from pyvectorsearch_spark.operators.textops import (  # noqa: F401
    bigram_lm_score,
    bm25_rank,
    c4_line_filter,
    chunk_text,
    doc_fingerprint,
    language_id,
    ngram_contamination,
    pii_redact,
    text_quality,
    tfidf_cosine_pairs,
    tfidf_top_terms,
    top_terms,
    vocab_encode,
)
from pyvectorsearch_spark.plans.scale import key_skew_report  # noqa: F401
from pyvectorsearch_spark.operators.knn import (  # noqa: F401
    mmr_rerank,
    recall_report,
)
from pyvectorsearch_spark.operators.spatial import (  # noqa: F401
    radius_join,
    radius_self_join,
)
from pyvectorsearch_spark.operators.dedup import (  # noqa: F401
    containment_pairs,
    srp_lsh_pairs,
)
from pyvectorsearch_spark.operators.textops import phrase_match  # noqa: F401
from pyvectorsearch_spark.operators.clustering import dbscan  # noqa: F401
from pyvectorsearch_spark.operators.skyline import skyline_2d  # noqa: F401
from pyvectorsearch_spark.operators.graph import kcore_peel  # noqa: F401
from pyvectorsearch_spark.operators.dedup import hamming_pairs_bucketed  # noqa: F401
from pyvectorsearch_spark.operators.multimodal import (  # noqa: F401
    audio_fingerprint_pairs,
    image_dhash_pairs,
)
from pyvectorsearch_spark.operators.textops import boilerplate_prefixes  # noqa: F401
from pyvectorsearch_spark.operators.linalg import (  # noqa: F401
    power_iteration_top_component,
)
from pyvectorsearch_spark.operators.incremental import delta_join_counts  # noqa: F401
from pyvectorsearch_spark.operators.textops import bpe_learn  # noqa: F401
from pyvectorsearch_spark.operators.sketches import (  # noqa: F401
    hll_distinct,
    hll_fold,
    hll_registers,
)
from pyvectorsearch_spark.operators.textops import (  # noqa: F401
    feature_hash,
    html_clean,
    url_stats,
)
from pyvectorsearch_spark.operators.clustering import (  # noqa: F401
    kcenter_coreset,
    kmeans_assign,
    kmeans_fixed,
)
from pyvectorsearch_spark.operators.graph import mutual_knn_pairs  # noqa: F401
from pyvectorsearch_spark.operators.timeseries import (  # noqa: F401
    sweep_peak_concurrency,
)
from pyvectorsearch_spark.operators.dedup import (  # noqa: F401
    incremental_dedup_delta,
)
