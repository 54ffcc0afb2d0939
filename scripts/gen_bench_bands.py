"""Regenerate BENCH_BANDS.json — the per-key expected-band artifact
that turns BASELINE.md's prose warm-re-time protocol into something the
driver, the contract test, and the next judge can diff mechanically
(round-5 VERDICT item 3: documented ≥2x first-run swings made a real
1.5x regression invisible).

Usage:
    python scripts/gen_bench_bands.py sample1.json [sample2.json ...] \
        [--drop sampleN.json:kM ...] [--centers-only] [--era-normalize]

``--era-normalize`` divides every value in a sample by that sample's
own recorded ``era`` field before banding (samples without the field,
or with era <= 1, pass through raw). Round-10 use: no genuinely quiet
window appeared in rounds 8-10 (the calmest sustained era was ~1.35),
so the round-9/10 samples are folded at their quiet-equivalent levels —
sound because each sample's era was computed against the round-7 QUIET
centers, so the division maps observations back onto that scale, and a
single key's real cost change cannot bend the median-of-~125 era.

``--merge-missing`` keeps every committed band and center VERBATIM and
adds entries only for keys absent from the committed file — used when
bench keys appended since the last full regen finally have quiet(-
equivalent) samples (round-11: k131/k132 landed mid-round-10, so the
r10 regen's sample set predates them; refitting all 131 existing keys
from post-optimization samples would silently rescale the era
denominator across rounds, which only a deliberate full regen should
do).

``--drop`` excludes a single known-defective observation — e.g.
BENCH_r05.json's k44=9.81 s was the diagnosed gopher-persist leak
(fixed round 6), and folding a confirmed defect into a band would
teach the band to accept the defect.

The file also carries per-key quiet CENTERS (median across the input
samples) — the denominator of ``bench.era_coefficient``'s
self-normalization (round-8 VERDICT item 1): a sample's era is the
median of observed/center over all keys, and the oob hi comparison
divides by it, so a host-throttled sample (round 8: a uniform ~1.65x
slow era for a whole day) re-reads with ~0 spurious flags while a real
single-key regression still flags. ``--centers-only`` keeps the
committed bands VERBATIM and recomputes only the centers from the given
samples — used when the band inputs are no longer on disk but a
committed quiet sample should anchor the era (round 9 bootstrap:
centers from BENCH_SAMPLE_r7.json, bands untouched).

Each sample is either a raw bench line (``{"metric": ..., "queries":
{"k0": s, ...}}``) or a driver BENCH_r*.json wrapper whose ``tail``
holds that line. Only QUIET-machine samples belong here — a loaded
sample inflates every band it touches.

Band law: ``lo = 0.2 * min(samples)`` (an entry suddenly doing
near-zero work is as suspicious as a slow one), ``hi = max(1.4 *
max(samples), max(samples) + 0.4)`` (1.4x the worst quiet observation,
with +0.4 s absolute headroom so sub-second entries don't flag on
scheduler jitter). Round 6 needed hi = 2*max because first-run
Arrow-kernel compile produced documented 3-5x swings; round 7 removed
the cause — bench.py now pushes one small batch through every
kernel-bearing entry at sf0.001 before the timed loop (WARMUP_QUERIES)
— so the samples feeding this law are warm and the band can be tight
enough that a real 1.5x regression actually flags. A key outside
[lo, hi] is worth a warm re-time; a key outside it on THREE
consecutive quiet samples is a regression.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import bench  # noqa: E402


def load_sample(path: str, era_normalize: bool = False) -> dict:
    with open(path) as f:
        raw = json.load(f)
    if "queries" not in raw:
        m = re.search(r'\{"metric".*\}', raw.get("tail", ""))
        if not m:
            raise SystemExit(f"{path}: neither a bench line nor a driver wrapper")
        raw = json.loads(m.group(0))
    era = raw.get("era") or 1.0
    if era_normalize and era > 1.0:
        raw = dict(raw)
        raw["queries"] = {k: round(v / era, 3) for k, v in raw["queries"].items()}
    return raw


def main(argv: list[str]) -> None:
    paths: list[str] = []
    drops: set[tuple[str, str]] = set()
    centers_only = False
    era_normalize = False
    merge_missing = False
    it = iter(argv)
    for a in it:
        if a == "--drop":
            # rsplit: sample paths may themselves contain ':'; a bare
            # trailing --drop or a missing :kN suffix gets a usable
            # message instead of StopIteration/ValueError (round-7 ADVICE)
            spec = next(it, None)
            if spec is None or ":" not in spec:
                raise SystemExit(f"--drop expects sample.json:kN, got {spec!r}")
            sample, key = spec.rsplit(":", 1)
            drops.add((os.path.basename(sample), key))
        elif a == "--centers-only":
            centers_only = True
        elif a == "--merge-missing":
            merge_missing = True
        elif a == "--era-normalize":
            era_normalize = True
        else:
            paths.append(a)
    if not paths:
        raise SystemExit(__doc__)
    samples = {p: load_sample(p, era_normalize)["queries"] for p in paths}
    for p in samples:
        for sample, key in drops:
            if os.path.basename(p) == sample:
                samples[p].pop(key, None)
    bands: dict[str, list[float]] = {}
    centers: dict[str, float] = {}
    for key in bench.BENCH_KEYS.values():
        vals = sorted(s[key] for s in samples.values() if key in s)
        if not vals:
            continue
        bands[key] = [
            round(0.2 * vals[0], 2),
            round(max(1.4 * vals[-1], vals[-1] + 0.4), 2),
        ]
        # true median (ADVICE r9: the upper-middle element biased centers
        # high on even sample counts — same fix as bench.era_coefficient)
        centers[key] = round(statistics.median(vals), 2)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "BENCH_BANDS.json")
    meta = {
        "law": "lo=0.2*min(warm quiet samples); hi=max(1.4*max, max+0.4s)",
        "n_samples": len(samples),
        "samples": {os.path.basename(p): round(sum(s.values()), 2) for p, s in samples.items()},
        "dropped": sorted(f"{s}:{k}" for s, k in drops),
        "regen": "python scripts/gen_bench_bands.py <quiet sample jsons>",
        "era_normalize": era_normalize,
        "centers": "per-key quiet median — denominator of bench.era_coefficient",
    }
    if merge_missing:
        with open(out) as f:
            committed = json.load(f)
        added = sorted(set(bands) - set(committed["bands"]))
        for k in added:
            committed["bands"][k] = bands[k]
            committed["centers"][k] = centers[k]
        committed["_meta"]["merged_missing"] = {
            "keys": added,
            "samples": meta["samples"],
            "era_normalize": era_normalize,
        }
        doc = committed
        bands = committed["bands"]
    elif centers_only:
        with open(out) as f:
            committed = json.load(f)
        committed["centers"] = centers
        committed["_meta"]["centers"] = (
            meta["centers"]
            + f" (updated --centers-only from {[os.path.basename(p) for p in paths]})"
        )
        doc = committed
        bands = committed["bands"]
    else:
        doc = {"_meta": meta, "bands": bands, "centers": centers}
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"wrote {os.path.normpath(out)} ({len(bands)} keys from {len(samples)} samples)")


if __name__ == "__main__":
    main(sys.argv[1:])
