"""The oracle: run the full reference pipeline on one in-memory
document, producing the exact output span sequence the Spark pipeline
must match (SURVEY.md §5.2).

It is deliberately *thin*: all numerics live in
:mod:`dragnet_spark.kernels` and all encoding in
:mod:`dragnet_spark.spans`, and the Spark UDF calls the very same
functions — one implementation, two harnesses, zero drift.
"""

from __future__ import annotations

from .kernels import process_document, scrunch_series
from .params import Header, MaskSpec, RunConfig
from .plan import DedispPlan, build_plan
from .spans import build_output_spans, decode_document


def run_document(doc: dict, cfg: RunConfig,
                 mask: MaskSpec | None = None,
                 plan: DedispPlan | None = None) -> dict:
    """Process one document row ``{doc_id, spans}`` end to end:
    decode -> block loop (zap/mask/clip/SK/decimate/dedisperse) ->
    output spans.  Returns ``{doc_id, spans, metrics}``."""
    header, data, media = decode_document(doc["spans"])
    if plan is None:
        plan = build_plan(header, cfg, mask)
    out, metrics = process_document(data, plan)
    if cfg.use_dt:
        out = scrunch_series(out, plan.dt_factors)
    spans = build_output_spans(
        out, plan.dmlist, header, nsamp_dec=plan.nsamp_dec,
        tsamp_dec=plan.tsamp_dec, max_delay=plan.max_delay,
        prefix=cfg.prefix, media=media,
        dt_factors=plan.dt_factors if cfg.use_dt else None)
    return {"doc_id": doc["doc_id"], "spans": spans, "metrics": metrics}


def run_corpus(docs: list[dict], cfg: RunConfig,
               mask: MaskSpec | None = None) -> list[dict]:
    """Oracle over a list of document rows (plan cached per header)."""
    plans: dict[str, DedispPlan] = {}
    out = []
    for doc in docs:
        hjson = next(s["text"] for s in doc["spans"] if s["kind"] == "header")
        if hjson not in plans:
            plans[hjson] = build_plan(Header.from_json(hjson), cfg, mask)
        out.append(run_document(doc, cfg, mask, plans[hjson]))
    return out
