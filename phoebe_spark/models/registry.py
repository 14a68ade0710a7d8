"""Model artifact store.

Mirrors the reference's provider registry (/root/reference/analytics/app/
common/models.py:53-93): fitted models are persisted per job key to
``{root}/{env}_{job}_{kind}_model.p`` and lazily loaded on first use. dill
is unavailable in this container; models here are designed to be plain-
pickle-able (numpy arrays + python scalars), and MLlib models save/load
through their own ``.save()/.load()`` alongside.
"""

from __future__ import annotations

import os
import pickle
from typing import Any


class ModelRegistry:
    def __init__(self, root: str = "artifacts/models", env: str = "DEFAULT"):
        self.root = root
        self.env = env
        self._cache: dict[str, Any] = {}

    def _path(self, job: str, kind: str) -> str:
        return os.path.join(self.root, f"{self.env}_{job}_{kind}_model.p")

    def save(self, job: str, kind: str, model: Any) -> str:
        path = self._path(job, kind)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(model, f)
        self._cache[f"{job}:{kind}"] = model
        return path

    def load(self, job: str, kind: str) -> Any:
        key = f"{job}:{kind}"
        if key in self._cache:
            return self._cache[key]
        path = self._path(job, kind)
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            model = pickle.load(f)
        self._cache[key] = model
        return model

    def get_or_create(self, job: str, kind: str, factory) -> Any:
        model = self.load(job, kind)
        if model is None:
            model = factory()
            self._cache[f"{job}:{kind}"] = model
        return model
