from recommendit_tpu.evaluation.metrics import (  # noqa: F401
    average_precision,
    coverage,
    detect_training_serving_skew,
    evaluate_model,
    intra_list_diversity,
    kl_divergence_bins,
    mrr,
    ndcg_at_k,
    precision_at_k,
    recall_at_k,
)
