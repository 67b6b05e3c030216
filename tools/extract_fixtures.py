"""Extract golden per-document expectations from the reference demo fixtures.

Reads the PUBLIC reference demo artifacts (read-only, /root/reference/demo/data):
  - inputs: pile/sample-{1,2}.jsonl
  - raw stage:   puddin/pile_tables/raw/pile_<s>_Pile-CC_df.pkl.gz
  - mid stage:   puddin/pile_tables/tmp/...   (post C1-C4 scrub, pre-exclusion)
  - final stage: puddin/pile_tables/...       (kept docs, fully scrubbed)
  - exclusions:  puddin/pile_exclusions/...   (dropped docs + excl_type)

and writes tests/fixtures/golden.json with one record per selected document:
  {sample, text_id, raw, mid, label ("keep" | excl_type), clean (or null)}

This is DATA extraction for parity testing (SURVEY.md section 5), not code.
Run once: python tools/extract_fixtures.py
"""
from __future__ import annotations

import json
from pathlib import Path

import pandas as pd

REF = Path("/root/reference/demo/data")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "golden.json"


def load_sample(sample: str) -> list[dict]:
    raws = []
    seen = set()
    with (REF / "pile" / f"{sample}.jsonl").open(encoding="utf-8-sig") as f:
        for line in f:
            d = json.loads(line)
            if d["meta"]["pile_set_name"] != "Pile-CC":
                continue
            t = d["text"]
            if t in seen:  # reference dedups keep-first on raw (parse_pile.py:588)
                continue
            seen.add(t)
            raws.append(t)

    raw_df = pd.read_pickle(REF / "puddin" / "pile_tables" / "raw" / f"pile_{sample}_Pile-CC_df.pkl.gz")
    mid_df = pd.read_pickle(REF / "puddin" / "pile_tables" / "tmp" / f"pile_{sample}_Pile-CC_df.pkl.gz")
    fin_df = pd.read_pickle(REF / "puddin" / "pile_tables" / f"pile_{sample}_Pile-CC_df.pkl.gz")
    exc_df = pd.read_pickle(REF / "puddin" / "pile_exclusions" / f"pile_{sample}_Pile-CC_excl.pkl.gz")

    assert list(raw_df.raw) == raws, f"{sample}: jsonl-derived raw order mismatch"

    mid = dict(zip(mid_df.text_id, mid_df.text))
    fin = dict(zip(fin_df.text_id, fin_df.text))
    exc = dict(zip(exc_df.text_id, exc_df.excl_type))

    recs = []
    for tid, raw in zip(raw_df.text_id, raw_df.raw):
        label = exc.get(tid, "keep")
        recs.append(
            {
                "sample": sample,
                "text_id": str(tid),
                "raw": str(raw),
                "mid": str(mid[tid]) if tid in mid else None,
                "label": str(label),
                "clean": str(fin[tid]) if tid in fin else None,
            }
        )
    n_keep = sum(r["label"] == "keep" for r in recs)
    print(f"{sample}: {len(recs)} docs, {n_keep} keep / {len(recs) - n_keep} drop")
    return recs


def main() -> None:
    recs = load_sample("sample-1") + load_sample("sample-2")
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(recs, ensure_ascii=False, indent=1))
    print(f"wrote {len(recs)} records -> {OUT}")


if __name__ == "__main__":
    main()
