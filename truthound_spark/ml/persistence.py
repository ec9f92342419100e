"""Fitted-model persistence: save/load anomaly + pipeline models.

Reference: ml/anomaly_models/{isolation_forest,statistical,ensemble}.py
carry ``save``/``load`` on each fitted model; this module centralizes it
as a versioned ModelRegistry (JSON payloads under
``root/<name>/v<NNN>/``) so every fitted artifact the engine produces —
the native isolation forest, k-means centroids, PCA components,
statistical fences — can be persisted once and re-applied to any later
DataFrame without refitting.

Scale note: every payload here is MODEL-sized (trees × nodes scalars,
k × dim centroids), never data-sized — the registry stays a driver/
object-store artifact; application of a loaded model is the same
broadcast-and-score plan the fitting validators use.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

# ---------------------------------------------------------------------------
# isolation forest (validators/iforest.py) <-> JSON payload
# ---------------------------------------------------------------------------


def iforest_to_payload(model: Any) -> dict[str, Any]:
    """Pack the flat-array native forest into JSON-serializable lists."""
    return {
        "psi": int(model.psi),
        "score_threshold": float(model.score_threshold),
        "columns": list(model.columns),
        "trees": [
            {
                "feature": t.feature.tolist(),
                "threshold": t.threshold.tolist(),
                "left": t.left.tolist(),
                "right": t.right.tolist(),
                "size": t.size.tolist(),
                "depth": t.depth.tolist(),
            }
            for t in model.trees
        ],
    }


def iforest_from_payload(payload: dict[str, Any]) -> Any:
    import numpy as np

    from truthound_spark.validators.iforest import IsolationForestModel, _Tree

    trees = [
        _Tree(
            feature=np.asarray(t["feature"], dtype="int32"),
            threshold=np.asarray(t["threshold"], dtype="float64"),
            left=np.asarray(t["left"], dtype="int32"),
            right=np.asarray(t["right"], dtype="int32"),
            size=np.asarray(t["size"], dtype="int64"),
            depth=np.asarray(t["depth"], dtype="int32"),
        )
        for t in payload["trees"]
    ]
    return IsolationForestModel(
        trees=trees,
        psi=int(payload["psi"]),
        score_threshold=float(payload["score_threshold"]),
        columns=list(payload["columns"]),
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


class ModelRegistry:
    """Versioned model store (reference anomaly models' save/load,
    unified). Layout: ``root/<name>/v0001/model.json`` + ``meta.json``;
    point ``root`` at a mounted object store for cluster durability."""

    def __init__(self, root: str = ".truthound/models") -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths ---------------------------------------------------------------
    def _model_dir(self, name: str) -> str:
        d = os.path.join(self.root, name)
        os.makedirs(d, exist_ok=True)
        return d

    def list_models(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root) if os.path.isdir(os.path.join(self.root, d))
        )

    def list_versions(self, name: str) -> list[str]:
        d = self._model_dir(name)
        return sorted(v for v in os.listdir(d) if v.startswith("v"))

    def latest_version(self, name: str) -> str | None:
        vs = self.list_versions(name)
        return vs[-1] if vs else None

    # -- save/load -------------------------------------------------------------
    def save(
        self,
        name: str,
        kind: str,
        payload: dict[str, Any],
        params: dict[str, Any] | None = None,
    ) -> str:
        vs = self.list_versions(name)
        # max existing number + 1, NOT len+1 — after delete_version the
        # count-based scheme would collide with a surviving version
        last = max((int(v[1:]) for v in vs if v[1:].isdigit()), default=0)
        version = f"v{last + 1:04d}"
        vdir = os.path.join(self._model_dir(name), version)
        os.makedirs(vdir)
        with open(os.path.join(vdir, "model.json"), "w") as f:
            json.dump(payload, f)
        with open(os.path.join(vdir, "meta.json"), "w") as f:
            json.dump(
                {
                    "name": name,
                    "kind": kind,
                    "version": version,
                    "created_at": time.time(),
                    "params": params or {},
                },
                f,
            )
        return version

    def load(self, name: str, version: str | None = None) -> tuple[dict[str, Any], dict[str, Any]]:
        version = version or self.latest_version(name)
        if version is None:
            raise FileNotFoundError(f"no versions saved for model {name!r}")
        vdir = os.path.join(self.root, name, version)
        with open(os.path.join(vdir, "model.json")) as f:
            payload = json.load(f)
        with open(os.path.join(vdir, "meta.json")) as f:
            meta = json.load(f)
        return payload, meta

    def delete_version(self, name: str, version: str) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.root, name, version))

    # -- typed conveniences -------------------------------------------------
    def save_iforest(self, name: str, model: Any, **params: Any) -> str:
        return self.save(name, "isolation_forest", iforest_to_payload(model), params)

    def load_iforest(self, name: str, version: str | None = None) -> Any:
        payload, meta = self.load(name, version)
        if meta["kind"] != "isolation_forest":
            raise ValueError(f"{name}/{meta['version']} is kind {meta['kind']!r}")
        return iforest_from_payload(payload)

    def save_centroids(
        self, name: str, centroids: list[list[float]], **params: Any
    ) -> str:
        return self.save(name, "kmeans_centroids", {"centroids": centroids}, params)

    def load_centroids(self, name: str, version: str | None = None) -> list[list[float]]:
        payload, meta = self.load(name, version)
        if meta["kind"] != "kmeans_centroids":
            raise ValueError(f"{name}/{meta['version']} is kind {meta['kind']!r}")
        return payload["centroids"]

    def save_pca(
        self,
        name: str,
        components: list[list[float]],
        means: list[float],
        threshold: float,
        **params: Any,
    ) -> str:
        return self.save(
            name,
            "pca",
            {"components": components, "means": means, "threshold": threshold},
            params,
        )

    def save_statistical(
        self, name: str, fences: dict[str, dict[str, float]], **params: Any
    ) -> str:
        """Per-column robust fences (reference ml/anomaly_models/
        statistical.py): {'col': {'lo': .., 'hi': ..}}."""
        return self.save(name, "statistical_fences", {"fences": fences}, params)

    def save_ensemble(self, name: str, ensemble: Any, **params: Any) -> str:
        """Fitted EnsembleAnomalyDetector (reference ensemble.py:58) —
        composite payload: strategy + normalized weights + every
        component's fitted stats."""
        return self.save(name, "ensemble", ensemble.to_payload(), params)

    def load_ensemble(self, name: str, version: str | None = None) -> Any:
        from truthound_spark.ml.ensemble import EnsembleAnomalyDetector

        payload, meta = self.load(name, version)
        if meta["kind"] != "ensemble":
            raise ValueError(f"{name}/{meta['version']} is kind {meta['kind']!r}")
        return EnsembleAnomalyDetector.from_payload(payload)

    def save_distribution_drift(self, name: str, detector: Any, **params: Any) -> str:
        """Fitted DistributionDriftDetector (reference distribution.py:45)
        — O(columns x (bins + grid)) payload, never raw values."""
        return self.save(name, "distribution_drift", detector.to_payload(), params)

    def load_distribution_drift(self, name: str, version: str | None = None) -> Any:
        from truthound_spark.ml.distribution_drift import DistributionDriftDetector

        payload, meta = self.load(name, version)
        if meta["kind"] != "distribution_drift":
            raise ValueError(f"{name}/{meta['version']} is kind {meta['kind']!r}")
        return DistributionDriftDetector.from_payload(payload)

    def save_feature_drift(self, name: str, detector: Any, **params: Any) -> str:
        """Fitted FeatureDriftDetector (reference feature.py:80) —
        O(columns + categories) profile payload; detection against a
        loaded profile never re-scans the reference."""
        return self.save(name, "feature_drift", detector.to_payload(), params)

    def load_feature_drift(self, name: str, version: str | None = None) -> Any:
        from truthound_spark.ml.feature_drift import FeatureDriftDetector

        payload, meta = self.load(name, version)
        if meta["kind"] != "feature_drift":
            raise ValueError(f"{name}/{meta['version']} is kind {meta['kind']!r}")
        return FeatureDriftDetector.from_payload(payload)

    def save_multivariate_drift(self, name: str, detector: Any, **params: Any) -> str:
        """Fitted MultivariateDriftDetector (reference multivariate.py:46)
        — O(features²) payload: corr matrix, moments, PCA components."""
        return self.save(name, "multivariate_drift", detector.to_payload(), params)

    def load_multivariate_drift(self, name: str, version: str | None = None) -> Any:
        from truthound_spark.ml.multivariate_drift import MultivariateDriftDetector

        payload, meta = self.load(name, version)
        if meta["kind"] != "multivariate_drift":
            raise ValueError(f"{name}/{meta['version']} is kind {meta['kind']!r}")
        return MultivariateDriftDetector.from_payload(payload)

    def save_concept_drift(self, name: str, detector: Any, **params: Any) -> str:
        """Fitted ConceptDriftDetector (reference concept.py carries
        save/load via its model registry) — payload is O(features)."""
        return self.save(name, "concept_drift", detector.to_payload(), params)

    def load_concept_drift(self, name: str, version: str | None = None) -> Any:
        from truthound_spark.ml.concept_drift import ConceptDriftDetector

        payload, meta = self.load(name, version)
        if meta["kind"] != "concept_drift":
            raise ValueError(f"{name}/{meta['version']} is kind {meta['kind']!r}")
        return ConceptDriftDetector.from_payload(payload)
