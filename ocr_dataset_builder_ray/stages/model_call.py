"""Generic external-model call stage — the reference's core operator.

The reference pipeline's heart is a rate-limited, retrying,
cost-accounted LLM batch call (`_process_single_batch`,
/root/reference/ocr_dataset_builder/llm/text_pipeline.py:57-162: client
init per worker at 91-94, token counts + cost at 120-151; sequential
per-worker calls "to avoid overwhelming API" per the backpressure note
at 221-222). This module re-expresses that as a reusable Ray Data
actor-pool stage:

* **bounded concurrency** — the actor pool size (``map_batches``
  ``concurrency``) IS the global in-flight call bound; an optional
  per-actor ``min_interval_s`` adds client-side rate limiting
  (pool_size / min_interval_s calls per second fleet-wide);
* **client lifecycle** — ``client_factory()`` runs once per actor in
  ``__init__`` (A1/A2 pattern: fail-fast on a broken client), never
  per batch;
* **retry-with-status** — each call retries with exponential backoff;
  exhausted retries emit M5 failure sentinels on the rows (never
  raise, never drop);
* **token/cost columns** — per row: ``input_tokens, output_tokens,
  cost_microusd`` using the reference's tiered pricing semantics
  (`calculate_gemini_cost`, llm/utils/costing.py:55-150). Cost is
  fixed-point micro-USD (int64) so distributed sums are exact at any
  parallelism.

Call granularity: one call per row (default — per-row columns are
deterministic at any parallelism, which the correctness gate needs) or
one call per ``group_size`` rows (the reference's frames-per-batch
concatenation, text_pipeline.py:78-81); grouped mode attributes
call-level token counts to the group's rows and is deterministic only
under a keyed upstream grouping (``groupby(...).map_groups`` or a
keyed repartition) — documented partitioning assumption.

No real model client exists in this environment; ``FakeModelClient``
is the deterministic stand-in (prefix transform + whitespace token
counts) that exercises the full stage shape and is SQL-reproducible
for the q42 oracle.
"""

from __future__ import annotations

import time

import pyarrow as pa

from ..functions.textstats import token_count_ws

STATUS_OK = "ok"
STATUS_CALL_FAILED = "<<< MODEL_CALL_FAILED >>>"
STATUS_PARSE_MISMATCH = "<<< MODEL_RESPONSE_LENGTH_MISMATCH >>>"

SECTION_SEP = "\n--- Doc {i} ---\n"  # reference's "--- Frame {i} ---" framing


def calculate_cost_microusd(
    pricing: dict | None, input_tokens: int, output_tokens: int
) -> int:
    """Tiered per-token pricing → int micro-USD.

    Mirrors the reference's `calculate_gemini_cost`
    (llm/utils/costing.py:101-144): with ``threshold_k`` the INPUT
    token count selects the ``<=Nk`` / ``>Nk`` tier for both rates;
    rates are USD per million tokens — which is exactly micro-USD per
    token, so ``tokens × rate`` IS the micro-USD cost with no division
    (float-exact for binary-representable rates → identical across
    engine and SQL oracle). Missing pricing → 0.
    """
    if not pricing:
        return 0
    if "threshold_k" in pricing:
        k = pricing["threshold_k"]
        tier = pricing.get(
            f"<={k}k" if input_tokens <= k * 1000 else f">{k}k", {}
        )
        in_rate, out_rate = tier.get("input", 0.0), tier.get("output", 0.0)
    else:
        in_rate, out_rate = pricing.get("input", 0.0), pricing.get("output", 0.0)
    return int(input_tokens * in_rate + output_tokens * out_rate + 0.5)


class FakeModelClient:
    """Deterministic stand-in for an external model client.

    ``generate(prompt, text)`` → ``(response, input_tokens,
    output_tokens)`` with response = ``"CLEANED: " + text`` and
    whitespace token counts — pure functions of the inputs, so the q42
    oracle can reproduce every column in SQL.

    ``fail_first_n``: raise on the first N calls of THIS client
    instance (per-actor) — exercises the retry path deterministically.
    """

    def __init__(self, fail_first_n: int = 0) -> None:
        self._calls = 0
        self._fail_first_n = fail_first_n

    def generate(self, prompt: str, text: str) -> tuple[str, int, int]:
        self._calls += 1
        if self._calls <= self._fail_first_n:
            raise ConnectionError(f"fake transient failure #{self._calls}")
        response = "CLEANED: " + text
        input_tokens = token_count_ws(prompt) + token_count_ws(text)
        output_tokens = token_count_ws(response)
        return response, input_tokens, output_tokens


class ModelCallStage:
    """Callable-class stage for ``map_batches(..., concurrency=N)``.

    __init__ (once per actor): build the client via ``client_factory``
    — a broken factory fails the actor fast (A2). __call__ (per Arrow
    batch): one client call per row (or per ``group_size`` rows),
    retried with backoff; emits the input columns plus ``response,
    input_tokens, output_tokens, cost_microusd, call_status``.
    """

    def __init__(
        self,
        client_factory=FakeModelClient,
        *,
        text_col: str = "text",
        prompt: str = "",
        pricing: dict | None = None,
        max_retries: int = 3,
        backoff_s: float = 0.05,
        min_interval_s: float = 0.0,
        group_size: int = 1,
    ) -> None:
        self.client = client_factory()  # fail-fast in the actor
        self.text_col = text_col
        self.prompt = prompt
        # pricing may arrive JSON-serialized (model_call() sends it that
        # way so fn_constructor_kwargs stay hashable for Ray's schema
        # dedup — a raw dict triggers a per-batch "Failed to hash the
        # schemas" warning in ray 2.49)
        if isinstance(pricing, str):
            import json

            pricing = json.loads(pricing) if pricing else None
        self.pricing = pricing
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.min_interval_s = min_interval_s
        self.group_size = max(1, group_size)
        self._last_call = 0.0

    # -- call plumbing ------------------------------------------------------
    def _rate_limit(self) -> None:
        if self.min_interval_s > 0:
            wait = self._last_call + self.min_interval_s - time.monotonic()
            if wait > 0:
                time.sleep(wait)
        self._last_call = time.monotonic()

    def _call_with_retry(self, text: str):
        """→ (response, in_tokens, out_tokens) or None after retries."""
        for attempt in range(self.max_retries + 1):
            self._rate_limit()
            try:
                return self.client.generate(self.prompt, text)
            except Exception:
                if attempt < self.max_retries:
                    time.sleep(self.backoff_s * (2**attempt))
        return None

    # -- row/group processing ----------------------------------------------
    def _rows_single(self, texts: list[str]):
        for text in texts:
            got = self._call_with_retry(text or "")
            if got is None:
                yield "", 0, 0, 0, STATUS_CALL_FAILED
            else:
                resp, tin, tout = got
                yield resp, tin, tout, calculate_cost_microusd(
                    self.pricing, tin, tout
                ), STATUS_OK

    def _rows_grouped(self, texts: list[str]):
        """Reference-style concatenated call per ``group_size`` rows;
        the response is split back on the section framing and validated
        (M9: structural mismatch fails the whole group's rows)."""
        for s in range(0, len(texts), self.group_size):
            chunk = [t or "" for t in texts[s : s + self.group_size]]
            joined = "".join(
                SECTION_SEP.format(i=i) + t for i, t in enumerate(chunk)
            )
            got = self._call_with_retry(joined)
            if got is None:
                yield from (("", 0, 0, 0, STATUS_CALL_FAILED) for _ in chunk)
                continue
            resp, tin, tout = got
            parts = []
            cursor = 0  # markers are consumed left-to-right: a document
            # whose TEXT contains a section-marker string must not pull
            # the scan backwards into an earlier section
            for i in range(len(chunk)):
                marker = SECTION_SEP.format(i=i)
                nxt = SECTION_SEP.format(i=i + 1)
                start = resp.find(marker, cursor)
                if start < 0:
                    parts = None
                    break
                start += len(marker)
                end = resp.find(nxt, start)
                parts.append(resp[start : end if end >= 0 else len(resp)])
                cursor = start
            if parts is None or len(parts) != len(chunk):
                yield from (("", 0, 0, 0, STATUS_PARSE_MISMATCH) for _ in chunk)
                continue
            cost = calculate_cost_microusd(self.pricing, tin, tout)
            for p in parts:
                yield p, tin, tout, cost, STATUS_OK

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        rows = (
            self._rows_single(texts)
            if self.group_size == 1
            else self._rows_grouped(texts)
        )
        resp, tin, tout, cost, status = (
            zip(*rows) if len(texts) else ((), (), (), (), ())
        )
        return (
            batch.append_column("response", pa.array(resp, pa.string()))
            .append_column("input_tokens", pa.array(tin, pa.int64()))
            .append_column("output_tokens", pa.array(tout, pa.int64()))
            .append_column("cost_microusd", pa.array(cost, pa.int64()))
            .append_column("call_status", pa.array(status, pa.string()))
        )


def model_call(
    ds,
    *,
    client_factory=FakeModelClient,
    text_col: str = "text",
    prompt: str = "",
    pricing: dict | None = None,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int | None = 64,
    **stage_kwargs,
):
    """Dataset → Dataset with model-call columns. ``concurrency`` is the
    hard bound on in-flight external calls (actor pool size)."""
    import json

    return ds.map_batches(
        ModelCallStage,
        fn_constructor_kwargs=dict(
            client_factory=client_factory,
            text_col=text_col,
            prompt=prompt,
            # serialized so every constructor kwarg is hashable (see
            # ModelCallStage.__init__) — dict-valued kwargs defeat Ray's
            # schema dedup and spam warnings at every batch
            pricing=json.dumps(pricing) if isinstance(pricing, dict) else pricing,
            **stage_kwargs,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
