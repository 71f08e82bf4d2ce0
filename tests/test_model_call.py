"""External-model call stage: bounded-concurrency actor pool, retry
with failure sentinels, tiered cost accounting, grouped-call mode
(reference llm/text_pipeline.py:57-162 / costing.py:55-150 semantics)."""

import pandas as pd
import pytest
import ray.data

from ocr_dataset_builder_ray.stages.model_call import (
    STATUS_CALL_FAILED,
    STATUS_OK,
    FakeModelClient,
    ModelCallStage,
    calculate_cost_microusd,
    model_call,
)

PRICING = {
    "threshold_k": 0.2,
    "<=0.2k": {"input": 1.25, "output": 5.0},
    ">0.2k": {"input": 2.5, "output": 10.0},
}


def _docs():
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["hello world", "", "one two three four"],
            }
        )
    )


def test_cost_tiers():
    # low tier: micro-USD = tokens x (USD per M) exactly
    assert calculate_cost_microusd(PRICING, 100, 10) == int(100 * 1.25 + 10 * 5.0 + 0.5)
    # input tokens select the tier for BOTH rates (reference semantics)
    assert calculate_cost_microusd(PRICING, 300, 10) == int(300 * 2.5 + 10 * 10.0 + 0.5)
    assert calculate_cost_microusd(None, 100, 10) == 0
    flat = {"input": 2.0, "output": 4.0}
    assert calculate_cost_microusd(flat, 10, 5) == 40


def test_fake_client_deterministic(ray_session):
    out = (
        model_call(_docs(), prompt="p q", pricing=PRICING, concurrency=(1, 2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["response"]) == [
        "CLEANED: hello world",
        "CLEANED: ",
        "CLEANED: one two three four",
    ]
    # prompt=2 tokens; empty text -> 0 in / 1 out ("CLEANED:")
    assert list(out["input_tokens"]) == [4, 2, 6]
    assert list(out["output_tokens"]) == [3, 1, 5]
    assert (out["call_status"] == STATUS_OK).all()
    # floor(x + 0.5) fixed-point rounding (NOT python banker's round)
    assert list(out["cost_microusd"]) == [
        int(4 * 1.25 + 3 * 5.0 + 0.5),
        int(2 * 1.25 + 1 * 5.0 + 0.5),
        int(6 * 1.25 + 5 * 5.0 + 0.5),
    ]


def test_retry_recovers_then_sentinel(ray_session):
    # client fails its first 2 calls per actor; max_retries=3 -> first
    # row succeeds on the 3rd attempt, everything OK
    ok = model_call(
        _docs(),
        client_factory=lambda: FakeModelClient(fail_first_n=2),
        concurrency=1,
        max_retries=3,
        backoff_s=0.0,
    ).to_pandas()
    assert (ok["call_status"] == STATUS_OK).all()

    # permanently failing client: sentinel rows, zero tokens, no raise
    class AlwaysFails:
        def generate(self, prompt, text):
            raise ConnectionError("down")

    bad = model_call(
        _docs(),
        client_factory=AlwaysFails,
        concurrency=1,
        max_retries=1,
        backoff_s=0.0,
    ).to_pandas()
    assert (bad["call_status"] == STATUS_CALL_FAILED).all()
    assert (bad["input_tokens"] == 0).all() and (bad["cost_microusd"] == 0).all()
    # input rows are never dropped (M5)
    assert len(bad) == 3


def test_grouped_calls_roundtrip():
    """Reference frames-per-batch concatenation: one call per group,
    responses split back per section, call-level tokens attributed to
    the group's rows."""

    class EchoSections:
        # echoes input -> every section marker survives in the response
        def generate(self, prompt, text):
            return text, 10, 20

    import pyarrow as pa

    stage = ModelCallStage(
        client_factory=EchoSections, group_size=2, pricing={"input": 1.0, "output": 1.0}
    )
    batch = pa.table({"text": ["aaa", "bbb", "ccc"]})
    out = stage(batch).to_pandas()
    assert list(out["response"]) == ["aaa", "bbb", "ccc"]
    assert list(out["input_tokens"]) == [10, 10, 10]  # per call, shared
    assert (out["call_status"] == STATUS_OK).all()
    assert list(out["cost_microusd"]) == [30, 30, 30]


def test_grouped_split_ignores_marker_in_text():
    """A document whose TEXT contains a LATER section's marker string
    must not derail the splitter: markers are consumed left-to-right
    from the current section (ADVICE r2 — a from-offset-0 ``find`` let
    doc 1's end land at the embedded copy inside doc 0, before doc 1's
    start, silently emitting an empty response)."""

    class EchoSections:
        def generate(self, prompt, text):
            return text, 10, 20

    import pyarrow as pa

    from ocr_dataset_builder_ray.stages.model_call import SECTION_SEP

    tricky = "before" + SECTION_SEP.format(i=2) + "after"  # full marker, newlines included
    texts = [tricky, "second doc", "third doc"]
    stage = ModelCallStage(client_factory=EchoSections, group_size=3)
    out = stage(pa.table({"text": texts})).to_pandas()
    assert (out["call_status"] == STATUS_OK).all()
    # every section splits back to exactly its own text — in particular
    # doc 1, whose end marker also occurs (embedded) inside doc 0
    assert list(out["response"]) != ["", "", ""]
    assert out["response"][1] == "second doc"
    assert out["response"][2] == "third doc"


def test_grouped_mismatch_sentinel():
    class DropsMarkers:
        def generate(self, prompt, text):
            return "no markers at all", 1, 1

    import pyarrow as pa

    from ocr_dataset_builder_ray.stages.model_call import STATUS_PARSE_MISMATCH

    stage = ModelCallStage(client_factory=DropsMarkers, group_size=2)
    out = stage(pa.table({"text": ["a", "b"]})).to_pandas()
    assert (out["call_status"] == STATUS_PARSE_MISMATCH).all()


def test_rate_limit_spacing():
    import time

    import pyarrow as pa

    stage = ModelCallStage(min_interval_s=0.05)
    t0 = time.monotonic()
    stage(pa.table({"text": ["a", "b", "c"]}))
    assert time.monotonic() - t0 >= 0.10  # >= 2 inter-call gaps
