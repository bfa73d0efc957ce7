"""Spark 4 Python Data Source for the reference's REST extract stage.

The reference fetches search results on the DRIVER (one HTTPS call via
``googleapiclient``, ETL_pipeline_countries.py:42-49) and lands them as a
JSON file before Spark ever sees the data.  The idiomatic Spark-4 shape
for that boundary is a Python Data Source (``pyspark.sql.datasource``):
the fetch runs on EXECUTORS, one :class:`InputPartition` per keyword, so
a 230-keyword ingest (countries.py:2-233) fans out across the cluster
instead of serializing on the driver — the 100 TB-scale form of operator
#4 in SURVEY.md §2.1.  The flattened output schema equals the silver
relation the reference builds by explode+select (ETL_pipeline_countries.py:98-110),
making the landing-file + multiline-JSON-scan hop optional.

Payloads come from the deterministic :class:`SyntheticVideoSource`
(network-free parity twin of the YouTube API); a real REST backend drops
in by replacing one call inside ``read`` — the partition-per-keyword
plumbing, schema, and option handling stay identical.

Usage::

    spark.dataSource.register(VideoSearchDataSource)
    df = (spark.read.format("video_search")
          .option("keywords", "Germany,Japan")
          .option("maxResults", 40)
          .load())
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


@dataclass
class SyntheticVideoSource:
    """Deterministic, network-free stand-in for the YouTube API.

    Emits a payload with the exact nested shape the reference consumes
    (fields used at ETL_pipeline_countries.py:101-110; FIXTURES.md §B).
    ``overlap`` video ids are shared across keywords so anti-join-dedup
    paths are exercisable.

    Defined HERE (not in pipeline/video_etl.py, which re-exports it) so
    this module has no intra-package imports: it is shipped to executors
    by value (see the ``register_pickle_by_value`` call below) and must
    be importable-free.
    """

    seed: int = 42
    overlap: int = 0

    def fetch_page(self, keyword: str, page_size: int, page: int) -> dict:
        """One page of results (items ``page*page_size`` onward), with a
        real ``nextPageToken`` chain — the pagination the reference
        stores but never follows (ETL_pipeline_countries.py:104,
        SURVEY.md §2.1 fine print)."""
        payload = self.fetch(keyword, (page + 1) * page_size)
        payload["items"] = payload["items"][page * page_size :]
        payload["nextPageToken"] = f"page-{page + 1}"
        return payload

    def fetch(self, keyword: str, max_results: int) -> dict:
        items = []
        for i in range(max_results):
            if i < self.overlap:
                vid = f"vid-shared-{self.seed}-{i:04d}"
            else:
                vid = f"vid-{keyword}-{self.seed}-{i:04d}"
            items.append(
                {
                    "kind": "youtube#searchResult",
                    "etag": f"item-etag-{i}",
                    "id": {"kind": "youtube#video", "videoId": vid},
                    "snippet": {
                        "publishedAt": f"2024-05-{(i % 28) + 1:02d}T12:34:56Z",
                        "title": f"{keyword} video {i}",
                        "description": f"About {keyword} #{i}",
                        "channelTitle": f"channel-{i % 7}",
                    },
                }
            )
        return {
            "kind": "youtube#searchListResponse",
            "etag": f"etag-{keyword}-{self.seed}",
            "nextPageToken": "CAUQAA",
            "regionCode": "US",
            "pageInfo": {"totalResults": 1_000_000, "resultsPerPage": max_results},
            "items": items,
        }

#: Flattened silver schema (ETL_pipeline_countries.py:101-110 select list).
VIDEO_SEARCH_SCHEMA = (
    "keyword string, etag string, nextPageToken string, videoId string, "
    "title string, description string, channelTitle string, publishedAt timestamp"
)


class VideoSearchDataSource(DataSource):
    """``format("video_search")`` batch + streaming source; options:

    - ``keywords``: comma-separated search keywords (one input partition
      each — this is the parallelism unit);
    - ``maxResults``: rows per keyword (default 50, the reference's cap);
    - ``seed`` / ``overlap``: forwarded to the synthetic payload
      generator (``overlap`` ids repeat across keywords so downstream
      anti-join dedup has work to do);
    - streaming only: ``pageSize`` (rows per page per micro-batch,
      default 10) and ``pages`` (total pages available, default 5).
    """

    @classmethod
    def name(cls) -> str:
        return "video_search"

    def schema(self) -> str:
        return VIDEO_SEARCH_SCHEMA

    def reader(self, schema) -> "VideoSearchReader":
        return VideoSearchReader(self.options)

    def streamReader(self, schema) -> "VideoSearchStreamReader":
        return VideoSearchStreamReader(self.options)


class VideoSearchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        # option keys arrive lower-cased
        raw = options.get("keywords", "")
        self.keywords = [k.strip() for k in raw.split(",") if k.strip()]
        if not self.keywords:
            raise ValueError("video_search requires a non-empty 'keywords' option")
        self.max_results = int(options.get("maxresults", 50))
        self.seed = int(options.get("seed", 42))
        self.overlap = int(options.get("overlap", 0))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(k) for k in self.keywords]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # runs on an executor: this is where a real REST call would live
        keyword = partition.value
        payload = SyntheticVideoSource(seed=self.seed, overlap=self.overlap).fetch(
            keyword, self.max_results
        )
        etag = payload["etag"]
        next_token = payload["nextPageToken"]
        for item in payload["items"]:
            sn = item["snippet"]
            published = datetime.strptime(
                sn["publishedAt"], "%Y-%m-%dT%H:%M:%SZ"
            ).replace(tzinfo=timezone.utc)
            yield (
                keyword,
                etag,
                next_token,
                item["id"]["videoId"],
                sn["title"],
                sn["description"],
                sn["channelTitle"],
                published,
            )


class VideoSearchStreamReader(DataSourceStreamReader):
    """Paginated streaming reader: offset = pages consumed; each
    micro-batch fetches the NEXT page for every keyword (the
    ``nextPageToken`` chain the reference stores but never follows),
    with one :class:`InputPartition` per (keyword, page) so fetches
    still fan out across executors within a batch.

    ``latestOffset`` advances one page per trigger up to ``pages`` — a
    rate-limited source (maxFilesPerTrigger-style): a processingTime
    trigger drains exactly one page per micro-batch, giving real
    multi-batch incremental execution with offset tracking across
    batches.  (availableNow snapshots latestOffset once at start, so it
    consumes a single page — use a processingTime trigger and stop when
    caught up to drain the source.)"""

    def __init__(self, options: dict) -> None:
        raw = options.get("keywords", "")
        self.keywords = [k.strip() for k in raw.split(",") if k.strip()]
        if not self.keywords:
            raise ValueError("video_search requires a non-empty 'keywords' option")
        self.page_size = int(options.get("pagesize", 10))
        self.pages = int(options.get("pages", 5))
        self.seed = int(options.get("seed", 42))
        self.overlap = int(options.get("overlap", 0))
        self._served = 0

    def initialOffset(self) -> dict:
        return {"page": 0}

    def latestOffset(self) -> dict:
        if self._served < self.pages:
            self._served += 1
        return {"page": self._served}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        return [
            InputPartition((kw, page))
            for page in range(start["page"], end["page"])
            for kw in self.keywords
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        keyword, page = partition.value
        payload = SyntheticVideoSource(seed=self.seed, overlap=self.overlap).fetch_page(
            keyword, self.page_size, page
        )
        etag = payload["etag"]
        next_token = payload["nextPageToken"]
        for item in payload["items"]:
            sn = item["snippet"]
            published = datetime.strptime(
                sn["publishedAt"], "%Y-%m-%dT%H:%M:%SZ"
            ).replace(tzinfo=timezone.utc)
            yield (
                keyword,
                etag,
                next_token,
                item["id"]["videoId"],
                sn["title"],
                sn["description"],
                sn["channelTitle"],
                published,
            )

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up; offsets are deterministic


# Ship this module to executors BY VALUE: the engine is a repo-local
# package that is not necessarily on executor Python workers' sys.path
# (e.g. when the driver script lives elsewhere and prepends the repo
# path manually).  Spark pickles the DataSource class with its vendored
# cloudpickle, so registration must target that vendored instance.
from pyspark import cloudpickle as _cloudpickle  # noqa: E402

_cloudpickle.register_pickle_by_value(sys.modules[__name__])

__all__ = [
    "SyntheticVideoSource",
    "VideoSearchDataSource",
    "VideoSearchReader",
    "VideoSearchStreamReader",
    "VIDEO_SEARCH_SCHEMA",
]
