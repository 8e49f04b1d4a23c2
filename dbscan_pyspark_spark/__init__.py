"""dbscan_pyspark_spark — a PySpark-native density-clustering & analytics engine.

Brand-new DataFrame/MLlib implementation of the capabilities of
``vlee-harmonicinc/DBSCAN-pyspark`` (surveyed in SURVEY.md), plus
LLM-data-pipeline extension operators (dedup, similarity search, text
analysis, multimodal columns), designed for 100 TB scale:

- grid-bucketed ε-distance joins instead of cartesian products
  (reference: ``DBSCAN.py:161`` crashed at 10^4 rows; we bucket on
  ``floor(coord/eps)`` cells and equi-join)
- pure-DataFrame connected components (alternating large/small-star)
  so no GraphFrames jar is required
- every operator is a declarative DataFrame composition Catalyst/AQE
  can optimize — no RDDs, no row-at-a-time Python UDFs in hot paths
"""

__version__ = "0.1.0"

from dbscan_pyspark_spark.session import get_session  # noqa: F401
from dbscan_pyspark_spark.operators.dbscan import dbscan  # noqa: F401
from dbscan_pyspark_spark.operators.components import connected_components  # noqa: F401
from dbscan_pyspark_spark.operators.eps_join import (  # noqa: F401
    core_points,
    eps_join,
    eps_self_join,
    neighbor_counts,
)
from dbscan_pyspark_spark.operators.anonymize import (  # noqa: F401
    anonymize,
    assign_nearest,
    cluster_centroids,
    eps_sweep,
    information_loss,
)
from dbscan_pyspark_spark.operators.kmember import kmember_kmeans  # noqa: F401
from dbscan_pyspark_spark.operators.eps_join import k_distance  # noqa: F401
from dbscan_pyspark_spark.operators.events import (  # noqa: F401
    cohort_retention,
    funnel,
    session_agg,
    sliding_agg,
    tumbling_agg,
)
from dbscan_pyspark_spark.operators.pipeline import (  # noqa: F401
    dedup_keep_best,
    hash_split,
    pack_documents,
    profile_columns,
    stratified_sample,
)
from dbscan_pyspark_spark.operators.similarity import (  # noqa: F401
    cosine_topk,
    dequantized,
    ivf_cosine_topk,
    quantize_embeddings,
    tfidf_cosine_pairs,
)
from dbscan_pyspark_spark.sources.io import write_zordered, zorder_key  # noqa: F401
from dbscan_pyspark_spark.operators.kmeans import kmeans_quantized  # noqa: F401
from dbscan_pyspark_spark.operators.components import pagerank  # noqa: F401
from dbscan_pyspark_spark.operators.similarity import (  # noqa: F401
    embedding_covariance,
    pca_project,
)
from dbscan_pyspark_spark.operators.events import (  # noqa: F401
    merge_intervals,
    scd2_intervals,
    transition_counts,
)
from dbscan_pyspark_spark.operators.pipeline import (  # noqa: F401
    corpus_filter,
    integrity_check,
    token_entropy_stats,
)
from dbscan_pyspark_spark.operators.dedup import chunk_dedup_stats  # noqa: F401
from dbscan_pyspark_spark.sources.io import (  # noqa: F401
    read_json_robust,
    read_orc,
    read_text_corpus,
    upsert_parquet,
    write_orc,
)
from dbscan_pyspark_spark.operators.search import (  # noqa: F401
    bm25_topk,
    bm25_topk_from_postings,
    inverted_postings,
    phrase_search,
)
from dbscan_pyspark_spark.operators.tokenize import (  # noqa: F401
    bpe_apply,
    bpe_learn,
)
from dbscan_pyspark_spark.operators.dedup import (  # noqa: F401
    minhash_near_dup_pairs,
    simhash_near_dups,
    sorted_neighborhood_pairs,
)
from dbscan_pyspark_spark.operators.similarity import (  # noqa: F401
    IVFTwoLevelModel,
    auto_n_cells,
    ivf_fit_two_level,
    ivf_knn_graph,
    ivf_quantized_topk,
    mutual_knn_clusters,
)
from dbscan_pyspark_spark.operators.pipeline import (  # noqa: F401
    cms_estimates,
    count_min_sketch,
    lm_perplexity,
    pmi_collocations,
)
from dbscan_pyspark_spark.operators.jpeg import (  # noqa: F401
    decode_jpeg,
    encode_jpeg,
)
from dbscan_pyspark_spark.operators.pipeline import (  # noqa: F401
    bloom_filter_bits,
    bloom_probe,
    linear_count_distinct,
)
