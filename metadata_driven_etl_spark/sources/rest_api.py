"""REST API source (reference db_utils.py:45-74 + bronze_layer.py:202-220).

The reference does a blocking driver-side ``requests.get`` then
``parallelize`` + ``spark.read.json`` (an RDD detour). Two paths here:

- ``read_api_source``: small payloads — one driver fetch →
  ``spark.createDataFrame`` via json-normalized rows. Import-gated on
  ``requests`` (absent in this harness → clear error, unit tests inject a
  fetcher).
- ``read_api_source_distributed``: the scale path — a DataFrame of URLs
  (e.g. paginated endpoints) fanned out with ``mapInPandas`` so executors
  fetch in parallel; the driver never holds the payload.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from metadata_driven_etl_spark.config.model import SourceConfig


def _default_fetcher(url: str, token: str | None) -> list[dict]:
    try:
        import requests  # gated: not installed in this harness
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "REST API source needs the 'requests' package (not available "
            "in this environment); pass fetcher= explicitly in tests"
        ) from e
    headers = {"Authorization": f"Bearer {token}"} if token else {}
    resp = requests.get(url, headers=headers, timeout=60)
    resp.raise_for_status()
    data = resp.json()
    return data if isinstance(data, list) else [data]


def read_api_source(
    spark: SparkSession,
    src: SourceConfig,
    fetcher: Callable[[str, str | None], list[dict]] | None = None,
) -> DataFrame:
    token = os.environ.get(src.auth_token_env) if src.auth_token_env else None
    rows = (fetcher or _default_fetcher)(src.api_url or "", token)
    # json-normalize via the session's JSON reader for schema inference
    return spark.read.json(spark.sparkContext.parallelize([json.dumps(r) for r in rows]))


def read_api_source_distributed(
    url_df: DataFrame,
    result_schema: str,
    fetcher: Callable[[str, str | None], list[dict]] | None = None,
    token: str | None = None,
) -> DataFrame:
    """Fan out fetches across executors: url_df('url') → rows(result_schema).

    Each partition's URLs are fetched inside ``mapInPandas`` — bounded
    memory, parallel egress, no driver bottleneck.
    """
    import pandas as pd

    if fetcher is not None:
        fetch = fetcher
    else:
        # Defined locally (not the module-level _default_fetcher) so
        # cloudpickle ships it by value — executors may not have this
        # package on PYTHONPATH.
        def fetch(url: str, tok: str | None) -> list[dict]:
            import requests  # gated: not installed in this harness

            headers = {"Authorization": f"Bearer {tok}"} if tok else {}
            resp = requests.get(url, headers=headers, timeout=60)
            resp.raise_for_status()
            data = resp.json()
            return data if isinstance(data, list) else [data]

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url in pdf["url"]:
                out.extend(fetch(url, token))
            yield pd.DataFrame(out) if out else pd.DataFrame()

    return url_df.mapInPandas(fetch_partition, schema=result_schema)


# --- transient-failure retries ----------------------------------------------


def default_retryable(exc: Exception) -> bool:
    """Transient by default: connection/timeout errors and HTTP 5xx/429.

    Classified structurally (class name + optional ``response.status_code``)
    so the check works for ``requests`` exceptions without importing the
    package — and for any injected fetcher's exception types that follow
    the same shape.
    """
    name = type(exc).__name__
    if name in ("ConnectionError", "Timeout", "ReadTimeout", "ConnectTimeout",
                "ChunkedEncodingError", "TimeoutError", "OSError"):
        return True
    status = getattr(getattr(exc, "response", None), "status_code", None)
    return status is not None and (status >= 500 or status == 429)


def with_retries(
    fetch: Callable[[str, str | None], list[dict]],
    max_attempts: int = 4,
    base_delay_s: float = 0.5,
    retryable: Callable[[Exception], bool] = default_retryable,
    sleep: Callable[[float], None] | None = None,
) -> Callable[[str, str | None], list[dict]]:
    """Wrap a fetcher with bounded exponential backoff on TRANSIENT
    failures (0.5s, 1s, 2s, ... between attempts). Non-transient errors
    (4xx other than 429, parse errors) raise immediately — retrying a
    permanent failure only hides it. ``sleep`` is injectable so tests run
    with a fake clock.

    At scale this wraps the per-executor fetch in
    ``read_api_source_distributed`` too: each URL retries independently
    inside its task, so one flaky endpoint doesn't fail the whole fan-out
    (Spark task retries would re-fetch the entire partition).
    """
    import time as _time

    do_sleep = sleep if sleep is not None else _time.sleep

    def wrapped(url: str, token: str | None) -> list[dict]:
        for attempt in range(max_attempts):
            try:
                return fetch(url, token)
            except Exception as e:
                if attempt == max_attempts - 1 or not retryable(e):
                    raise
                do_sleep(base_delay_s * (2**attempt))
        raise AssertionError("unreachable")  # loop always returns or raises

    return wrapped
