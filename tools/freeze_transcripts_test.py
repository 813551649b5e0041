"""Regenerate the committed transcripts fixture ``data/transcripts_test``.

The entity/rule/transcript gate queries and the frozen pipeline oracle
(``data/pipeline_expected.parquet``) run over this table; it is the
deterministic output of the synthetic generator at the parameters below
(seed 42, 150 conversations, every 75th conversation a 400-turn mega —
reverse-checked against the original commit b57a472). Any change to
``documentai_spark/sources/transcripts.py`` content rules requires
re-running this tool AND ``tools/freeze_pipeline_expected.py`` (in that
order); ``tests/test_entry_contract.py`` fails while either is stale.

    python tools/freeze_transcripts_test.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from documentai_spark.sources.transcripts import write_transcripts_parquet

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "data", "transcripts_test")

SEED = 42
N_CONVS = 150
MEGA_EVERY = 75
MEGA_TURNS = 400


def main() -> None:
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    n = write_transcripts_parquet(OUT, seed=SEED, n_convs=N_CONVS,
                                  mega_every=MEGA_EVERY,
                                  mega_turns=MEGA_TURNS)
    print(f"wrote {n} rows -> {OUT}")


if __name__ == "__main__":
    main()
