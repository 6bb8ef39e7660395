"""FollowerFeed — keep a downstream lake table in sync with an upstream
lake table using INCREMENTAL changelog reads only (the consumer side of
read_changes; the lake-to-lake analog of subscribing to a changefeed).

First sync seeds from a full snapshot (read_version at the observed
upstream version); every later sync reads ONLY the delta files committed
since the last synced version and re-applies them with the same
conditional LWW merge — IO proportional to change volume, exactly-once by
version-ranged epoch ids (a crashed sync replays the same [from, to] range
under the same id and is swallowed)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ..lake.table import LakeTable


class FollowerFeed:
    def __init__(self, src: LakeTable, dst: LakeTable):
        self.src = src
        self.dst = dst
        self.src_id = hashlib.md5(src.root.encode()).hexdigest()[:8]

    def _last_synced(self) -> int | None:
        """Highest upstream version already applied — recovered from the
        destination's committed epoch ids (no side state to lose)."""
        best = None
        prefix = f"follow-{self.src_id}-"
        for e in self.dst.committed_epochs:
            if e.startswith(prefix):
                to = int(e.rsplit("v", 1)[1])
                best = to if best is None or to > best else best
        return best

    def sync(self) -> dict:
        """Catch the follower up to the upstream's current version.
        Returns {from, to, sync_mode, committed}."""
        self.src.refresh()
        to = self.src._manifest["version"]
        last = self._last_synced()
        if last is None:
            # bootstrap: full snapshot at `to`, recency-seeded below any
            # real commit ts so later changes always win
            key = self.src.key_col
            payload = [
                f["name"] for f in self.src.current_fields if f["name"] != key
            ]
            seed = self.src.read_version(to).select(
                F.col(key),
                F.lit("I").alias("op"),
                F.lit(0).alias("commit_ts"),
                F.lit(0).alias("seq"),
                *[F.col(c) for c in payload],
            )
            st = self.dst.merge_epoch(seed, f"follow-{self.src_id}-seed-v{to}")
            return {"from": None, "to": to, "sync_mode": "seed", **st}
        if to <= last:
            return {"from": last, "to": to, "sync_mode": "noop", "committed": False}
        changes = self.src.read_changes(since_version=last, to_version=to)
        st = self.dst.merge_epoch(
            changes, f"follow-{self.src_id}-v{last}-v{to}"
        )
        return {"from": last, "to": to, "sync_mode": "incremental", **st}
