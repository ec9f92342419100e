from truthound_spark.drift.detectors import (  # noqa: F401
    DriftResult,
    chi_square_drift,
    compare,
    js_divergence,
    kl_divergence,
    ks_test,
    mean_drift,
    mean_variance_drift_grouped,
    psi,
    psi_grouped,
    variance_drift,
    wasserstein,
)
