"""Driver-verifiable query registry (package facade).

Split per-family in r13 (VERDICT r12 #7) from the former single
15 kLoC module; the public surface is unchanged — QUERIES/ORACLES and
every helper import exactly as before, and section modules are
imported IN THE ORIGINAL ORDER so registration order (which fixes the
driver's bounded slot prefix) is byte-identical.
"""

from truthound_spark.entry_queries._core import (  # noqa: F401
    EV,
    ORACLES,
    QUERIES,
    _BPE_ROUNDS,
    _BPE_SQL,
    _CORPUS_SIG_SQL,
    _COS_SQL,
    _DRIFT_BASE,
    _DRIFT_CURR,
    _EVAL_SC,
    _GEO_SQL_BASE,
    _IVF_D2,
    _KS_SKETCH_EDGES,
    _KS_SKETCH_EDGE_VALUES,
    _LANG_PRED_SQL,
    _LOGREG_F,
    _LOGREG_ITERS,
    _NORM_SQL,
    _QSCORE_SQL,
    _SHINGLES_SQL,
    _URL_RAW_SQL,
    _WORDS_SQL,
    _ab_variant_sql,
    _bpe_oracle_ctes,
    _bpe_oracle_sql,
    _cond_rule_sql,
    _corpus_psi_block,
    _drift_frames,
    _eval_scored,
    _fd_conf_sql,
    _geo_df,
    _ivfpq_oracle_sql,
    _ivfpq_residual_oracle_sql,
    _kmeans_oracle_sql,
    _kmeans_vec_oracle_sql,
    _lof_embeddings_oracle,
    _logreg_feats,
    _logreg_weight_ctes,
    _lsh_multiprobe_oracle,
    _lsh_near_dup_oracle,
    _lsh_topk_oracle,
    _media_df,
    _pq_encode_oracle_sql,
    _pq_oracle_ctes,
    _pq_search_oracle_sql,
    _replay_dump_dir,
    _scalar_df,
    fused_counts,
    judge_counts,
    load_events,
    register,
    t,
)

# registration order = original single-module order
from truthound_spark.entry_queries import q01_completeness  # noqa: F401,E402
from truthound_spark.entry_queries import q02_training_data_pipeline_dedup  # noqa: F401,E402
from truthound_spark.entry_queries import q03_batch_9_one_sample  # noqa: F401,E402
from truthound_spark.entry_queries import q04_training_data_export_operators  # noqa: F401,E402
from truthound_spark.entry_queries import q05_misc  # noqa: F401,E402
from truthound_spark.entry_queries import q06_rule_threshold_learning_truthound  # noqa: F401,E402
from truthound_spark.entry_queries import q07_misc  # noqa: F401,E402
from truthound_spark.entry_queries import q08_r13_layout_reuse  # noqa: F401,E402
from truthound_spark.entry_queries.q07_misc import _BITEXT_FILTER_ORACLE  # noqa: F401,E402
