#!/usr/bin/env python
"""Freeze golden outputs for the model gates (model_langid, model_perplexity).

The two models are deterministic pure functions (puddin_spark.models), so the
gate can have a HARD oracle: this script replays the exact model arithmetic in
plain Python — no Spark involved — over the documents table of each testdata
SF and writes the expected outputs as parquet fixtures. The oracle SQL then
reads the fixture with DuckDB's read_parquet and the driver's rows/schema/hash
comparison runs exactly as for every other gate.

Independence argument: the Spark side executes the models through iterator
pandas UDFs (Arrow batches, executor-process singletons, models.py:206-224);
this script executes them through a driver-side Python loop over rows fetched
by DuckDB. The only shared code is the model arithmetic itself — which IS the
semantics under test — so a plumbing bug on either side (batching, null
handling, column wiring, Arrow conversion) breaks the hash match.

Run: python tools/freeze_model_golden.py  (re-run only if models.py changes;
tests/test_models.py::test_golden_fixtures_match_fresh_replay guards drift.)
"""
from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from puddin_spark.models import CharLMModel, LangIdModel, _SEED_TEXT  # noqa: E402

FIXTURE_DIR = REPO / "tests" / "fixtures"
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def compute_golden(sf_dir: str) -> tuple[pa.Table, pa.Table]:
    rows = duckdb.sql(
        f"select doc_id, lang, text from '{sf_dir}/documents.parquet' order by doc_id"
    ).fetchall()
    langid = LangIdModel()
    charlm = CharLMModel(3).train([_SEED_TEXT["en"]])
    doc_ids, langs, preds, scores, ppls = [], [], [], [], []
    for doc_id, lang, text in rows:
        pred, score = langid.predict_one(text or "")
        doc_ids.append(doc_id)
        langs.append(lang)
        preds.append(pred)
        scores.append(score)
        ppls.append(charlm.perplexity(text) if text else float("inf"))
    t_lang = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "pred_lang": pa.array(preds, pa.string()),
            "lang_score": pa.array(scores, pa.float64()),
        }
    )
    t_ppl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "ppl": pa.array(ppls, pa.float64()),
        }
    )
    return t_lang, t_ppl


def main() -> None:
    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    for sf_dir in SF_DIRS:
        if not Path(sf_dir).exists():
            continue
        sf = Path(sf_dir).name
        t_lang, t_ppl = compute_golden(sf_dir)
        pq.write_table(t_lang, FIXTURE_DIR / f"golden_model_langid_{sf}.parquet")
        pq.write_table(t_ppl, FIXTURE_DIR / f"golden_model_perplexity_{sf}.parquet")
        print(f"{sf}: {t_lang.num_rows} rows frozen")


if __name__ == "__main__":
    main()
