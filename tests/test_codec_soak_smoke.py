"""In-suite codec soak smoke (r8 verdict item 7): a 50-trial/family
random-config round-trip sweep over every codec family, so a codec
regression cannot land with a green pytest run. The committed
hypothesis properties run 25 curated examples per invariant; this
exercises the same mirrored encoder/decoder pairs across the random
config space that caught the VP8L meta-Huffman single-tile desync
(~1-in-350 configs). Deterministic: tools/codec_soak.py seeds its RNG
with a fixed constant, so these 50 trials are the same every run.
~30 s; the 300-1000-trial soak stays a tools/ command for
codec-change sessions.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_codec_soak_50_trials_clean():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "codec_soak.py"), "50"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "CLEAN" in proc.stdout
