"""Online feature store.

Preserves the reference's external contract
(``src/features/feature_store.py``): key prefixes ``user:feat:{id}`` /
``item:feat:{id}`` / ``recs:{id}``, msgpack-with-JSON-fallback
serialization, TTLs via SETEX, bulk pipeline loading, and a silent
in-memory fallback when Redis is unreachable (the fallback doubles as the
test fake, reference ``tests/test_features.py:231``).

Adds a packed-table export (:meth:`export_packed`) so serving can mirror the
store into dense device arrays for on-TPU feature assembly.
"""
from __future__ import annotations

import json
import logging
from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd

try:
    import redis  # type: ignore

    REDIS_AVAILABLE = True
except ImportError:  # pragma: no cover
    REDIS_AVAILABLE = False

try:
    import msgpack  # type: ignore

    MSGPACK_AVAILABLE = True
except ImportError:  # pragma: no cover
    MSGPACK_AVAILABLE = False

logger = logging.getLogger(__name__)

USER_FEATURE_PREFIX = "user:feat:"
ITEM_FEATURE_PREFIX = "item:feat:"
RECS_PREFIX = "recs:"


def _to_native(v: Any) -> Any:
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    return v


def serialize(data: Dict[str, Any]) -> bytes:
    """msgpack if available, else JSON (reference ``feature_store.py:30-45``)."""
    clean = {k: _to_native(v) for k, v in data.items()}
    if MSGPACK_AVAILABLE:
        return msgpack.packb(clean, use_bin_type=True)
    return json.dumps(clean).encode("utf-8")


def deserialize(data: bytes) -> Dict[str, Any]:
    if MSGPACK_AVAILABLE:
        try:
            return msgpack.unpackb(data, raw=False)
        except Exception:
            pass
    return json.loads(data.decode("utf-8"))


class FeatureStore:
    """Redis-backed online KV feature store with in-memory fallback."""

    def __init__(self, redis_url: str = "redis://localhost:6379", ttl: int = 3600):
        self.redis_url = redis_url
        self.ttl = ttl
        self._client: Optional[Any] = None
        self._memory_store: Dict[str, bytes] = {}
        self._use_redis = False
        self._snapshot = None
        self._connect()

    def _connect(self) -> None:
        if not REDIS_AVAILABLE:
            logger.warning("redis package unavailable; using in-memory store")
            return
        try:
            client = redis.from_url(self.redis_url, socket_connect_timeout=2)
            client.ping()
            self._client = client
            self._use_redis = True
            logger.info("Connected to Redis at %s", self.redis_url)
        except Exception as exc:
            logger.warning("Redis unreachable (%s); using in-memory store", exc)
            self._use_redis = False

    @property
    def is_redis_available(self) -> bool:
        return self._use_redis

    # --- low-level -------------------------------------------------- #

    def _set(self, key: str, value: bytes, ttl: Optional[int] = None) -> None:
        if self._use_redis:
            self._client.setex(key, ttl or self.ttl, value)
        else:
            self._memory_store[key] = value

    def _get(self, key: str) -> Optional[bytes]:
        if self._use_redis:
            return self._client.get(key)
        return self._memory_store.get(key)

    def _mget(self, keys: List[str]) -> List[Optional[bytes]]:
        if self._use_redis:
            return self._client.mget(keys)
        return [self._memory_store.get(k) for k in keys]

    # --- user features ---------------------------------------------- #

    def store_user_features(self, user_id: int, features: Dict[str, Any]) -> None:
        self._set(f"{USER_FEATURE_PREFIX}{user_id}", serialize(features))

    def get_user_features(self, user_id: int) -> Optional[Dict[str, Any]]:
        raw = self._get(f"{USER_FEATURE_PREFIX}{user_id}")
        if raw is not None:
            return deserialize(raw)
        if self._snapshot is not None:
            return self._snapshot.user_dict(user_id)
        return None

    # --- item features ---------------------------------------------- #

    def store_item_features(self, item_id: int, features: Dict[str, Any]) -> None:
        self._set(f"{ITEM_FEATURE_PREFIX}{item_id}", serialize(features))

    def get_item_features(self, item_id: int) -> Optional[Dict[str, Any]]:
        raw = self._get(f"{ITEM_FEATURE_PREFIX}{item_id}")
        if raw is not None:
            return deserialize(raw)
        if self._snapshot is not None:
            return self._snapshot.item_dict(item_id)
        return None

    def get_item_features_batch(
        self, item_ids: List[int]
    ) -> Dict[int, Optional[Dict[str, Any]]]:
        keys = [f"{ITEM_FEATURE_PREFIX}{i}" for i in item_ids]
        raws = self._mget(keys)
        out = {
            i: (deserialize(r) if r is not None else None)
            for i, r in zip(item_ids, raws)
        }
        if self._snapshot is not None:
            for i in item_ids:
                if out[i] is None:
                    out[i] = self._snapshot.item_dict(i)
        return out

    # --- zero-copy snapshot backing ---------------------------------- #

    def attach_snapshot(self, snapshot) -> None:
        """Back the store with a read-only mmap'd
        :class:`~recommendit_tpu.features.snapshot.FeatureSnapshot`:
        KV reads that miss fall through to the snapshot, so warm startup
        needs NO bulk load — writes still land in the KV layer and shadow
        the snapshot (online freshness wins)."""
        self._snapshot = snapshot

    # --- bulk load --------------------------------------------------- #

    def load_all_features(
        self,
        user_features_df: pd.DataFrame,
        item_features_df: pd.DataFrame,
        batch_size: int = 500,
    ) -> None:
        """Bulk-load flattened feature frames (genre_pref_*/genre_vec_*
        columns) into the store (reference ``feature_store.py:156-228``)."""
        logger.info(
            "Loading features: %d users, %d items",
            len(user_features_df), len(item_features_df),
        )

        ug_cols = [c for c in user_features_df.columns if c.startswith("genre_pref_")]
        u_scal = [c for c in user_features_df.columns
                  if c != "user_id" and c not in ug_cols]
        records = user_features_df.to_dict("records")
        for start in range(0, len(records), batch_size):
            chunk = records[start: start + batch_size]
            data = {}
            for row in chunk:
                feat: Dict[str, Any] = {c: row[c] for c in u_scal}
                if ug_cols:
                    feat["genre_pref"] = [float(row[c]) for c in ug_cols]
                data[f"{USER_FEATURE_PREFIX}{int(row['user_id'])}"] = serialize(feat)
            self._bulk_set(data)

        ig_cols = [c for c in item_features_df.columns if c.startswith("genre_vec_")]
        i_scal = [c for c in item_features_df.columns
                  if c not in ("item_id", "title") and c not in ig_cols]
        records = item_features_df.to_dict("records")
        has_title = "title" in item_features_df.columns
        for start in range(0, len(records), batch_size):
            chunk = records[start: start + batch_size]
            data = {}
            for row in chunk:
                feat = {c: row[c] for c in i_scal}
                if has_title:
                    feat["title"] = str(row["title"])
                if ig_cols:
                    feat["genre_vector"] = [float(row[c]) for c in ig_cols]
                data[f"{ITEM_FEATURE_PREFIX}{int(row['item_id'])}"] = serialize(feat)
            self._bulk_set(data)
        logger.info("Bulk load complete")

    def _bulk_set(self, data: Dict[str, bytes]) -> None:
        if self._use_redis:
            pipe = self._client.pipeline()
            for k, v in data.items():
                pipe.setex(k, self.ttl, v)
            pipe.execute()
        else:
            self._memory_store.update(data)

    # --- recommendation cache ---------------------------------------- #

    def cache_recommendations(
        self, user_id: int, recommendations: List[Dict], ttl: int = 300
    ) -> None:
        self._set(f"{RECS_PREFIX}{user_id}", serialize({"recs": recommendations}), ttl)

    def invalidate_recommendations(self, user_id: int) -> None:
        """Drop a user's cached recommendations (after feature updates)."""
        key = f"{RECS_PREFIX}{user_id}"
        if self._use_redis:
            self._client.delete(key)
        else:
            self._memory_store.pop(key, None)

    def get_cached_recommendations(self, user_id: int) -> Optional[List[Dict]]:
        raw = self._get(f"{RECS_PREFIX}{user_id}")
        if raw is None:
            return None
        return deserialize(raw).get("recs")

    # --- ops ---------------------------------------------------------- #

    def flush(self) -> None:
        if self._use_redis:
            self._client.flushdb()
        else:
            self._memory_store.clear()

    def stats(self) -> Dict[str, Any]:
        if self._use_redis:
            info = self._client.info("keyspace")
            db = info.get("db0", {})
            return {"backend": "redis", "url": self.redis_url,
                    "keys": db.get("keys", 0)}
        return {"backend": "in-memory", "keys": len(self._memory_store)}


# Backwards-compatible alias matching the reference class name.
RedisFeatureStore = FeatureStore
