"""Incremental fragment source — the scraper/scraperhelper analog.

The reference's pull-based source runs ``ScrapeFunc(ctx)`` on a
``collection_interval`` ticker with partial-error accumulation
(``/root/reference/scraper/scraperhelper/controller.go:88-182``,
``scraper/scrapererror/scrapeerror.go:17-29``). The batch analog
(SURVEY.md §2.1): each driver-loop tick reads only the Parquet fragments
that appeared since the last committed watermark, recorded in a small
state file (the storage-extension client analog).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field


@dataclass
class PartialScrapeError(Exception):
    """Partial-error accumulation: some fragments failed, the rest flow on
    (scrapererror semantics: Scrape returns data AND an error)."""

    failed: dict[str, str] = field(default_factory=dict)

    def __str__(self):
        return f"partial scrape failure: {self.failed}"


def _readable_probe(path: str) -> None:
    """Default validity probe: the file opens and yields a byte (or is
    empty) — catches permission/truncation races, not format errors."""
    with open(path, "rb") as f:
        f.read(1)


class IncrementalFileSource:
    """Generalized incremental watermark over ANY file reader — the
    filelog receiver's checkpointed tailing at FILE granularity (the
    batch analog: fragments are immutable closed files, so the
    checkpoint is the seen-file set, not a byte offset). ``reader`` maps
    a list of paths → Dataset; ``probe`` raises on an
    invalid/incomplete file, which is then reported in ``failed`` and
    retried next tick instead of poisoning the batch.

    The watermark commits at SCRAPE time while the returned Dataset is
    lazy, so a file the probe accepts but the reader later rejects is
    permanently skipped — pass a probe as strict as the format allows
    (the parquet subclass validates the footer; for JSONL at least the
    default readability probe runs), and call :meth:`unsee` to requeue
    files after a downstream read failure."""

    def __init__(self, pattern: str, state_path: str, reader,
                 probe=None):
        self.pattern = pattern
        self.state_path = state_path
        self.reader = reader
        self.probe = probe if probe is not None else _readable_probe

    def unsee(self, paths) -> None:
        """Remove files from the watermark so the next tick retries
        them — the requeue lever for lazy-read failures discovered
        after commit."""
        self._commit_seen(self._load_seen() - set(paths))

    def _load_seen(self) -> set[str]:
        try:
            with open(self.state_path) as f:
                return set(json.load(f)["seen"])
        except (FileNotFoundError, json.JSONDecodeError, KeyError):
            return set()

    def _commit_seen(self, seen: set[str]) -> None:
        tmp = self.state_path + ".tmp"
        os.makedirs(os.path.dirname(self.state_path) or ".", exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"seen": sorted(seen)}, f)
        os.replace(tmp, self.state_path)

    def scrape(self):
        """One tick → ``(dataset | None, new_paths, failed)``.

        Mirrors scrapererror: data AND errors are both returned — fragments
        that fail the validity probe are reported in ``failed`` (wrap in
        PartialScrapeError if the caller wants to raise) and retried next
        tick; good fragments are committed to the watermark immediately.

        Delivery note: the watermark advances at scrape time (the returned
        Dataset is lazy), so this source alone is at-most-once per
        fragment. End-to-end at-least-once comes from the partition
        manifests downstream (state/manifest.py): a fragment whose
        partition never commits is reprocessed by rerunning the job over
        the manifest store, not by rewinding this watermark.
        """
        seen = self._load_seen()
        candidates = sorted(set(glob.glob(self.pattern)) - seen)
        good, failed = [], {}
        for p in candidates:
            try:
                if self.probe is not None:
                    self.probe(p)  # cheap validity probe
                good.append(p)
            except Exception as e:  # noqa: BLE001 - accumulate, don't abort
                failed[p] = str(e)
        ds = self.reader(good) if good else None
        self._commit_seen(seen | set(good))
        return ds, good, failed


class IncrementalParquetSource(IncrementalFileSource):
    def __init__(self, pattern: str, state_path: str):
        import pyarrow.parquet as pq

        def read(paths):
            import ray.data

            return ray.data.read_parquet(paths)

        super().__init__(pattern, state_path, reader=read,
                         probe=pq.read_metadata)
