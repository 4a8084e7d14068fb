"""Micro-batch scheduling (reference A16).

The reference drives sync with APScheduler: 60 s interval, no overlapping
runs (``max_instances=1``), missed runs coalesced, one immediate first run
(``/root/reference/etl-service/src/main.py:80-91``). This loop reproduces
those semantics without a scheduler dependency: run, then sleep to the
next tick; a run longer than the interval simply coalesces the missed
ticks into the next run (exactly one pending execution at a time).

The Structured-Streaming-native expression of the same contract is
``trigger(processingTime="60 seconds")`` + ``foreachBatch`` (see
:func:`foreach_batch_sync`) — non-overlap and coalescing come from the
single micro-batch executor.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable


def run_scheduled(
    fn: Callable[[], object],
    interval_s: float,
    max_cycles: int | None = None,
    sleep: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
    stop: threading.Event | None = None,
) -> int:
    """Run ``fn`` immediately, then every ``interval_s`` seconds.

    Non-overlapping by construction (single-threaded); overruns coalesce:
    if a cycle takes 2.5 intervals, the next cycle starts immediately
    (one catch-up, not three). Returns completed cycle count;
    ``max_cycles`` bounds it for tests/batch use (None = run forever).

    ``stop`` (r9 directive #6) is the cooperative form of the
    reference's SIGINT/SIGTERM handlers
    (``etl-service/src/main.py:43-56``, ``scheduler.shutdown(wait=True)``):
    setting the event never interrupts a cycle — an IN-FLIGHT ``fn``
    always completes (so a sync's snapshot build/publish is never
    abandoned half-way; publish atomicity additionally guarantees no
    partial snapshot is ever visible even on hard kill) — and the loop
    then returns without starting another cycle. A stop raised during
    the inter-cycle sleep wakes the loop immediately (``Event.wait``
    replaces the injectable ``sleep`` when a stop event is supplied).
    """
    cycles = 0
    next_tick = clock()
    while max_cycles is None or cycles < max_cycles:
        if stop is not None and stop.is_set():
            break  # requested before the cycle started: don't start it
        fn()
        cycles += 1
        if max_cycles is not None and cycles >= max_cycles:
            break  # no trailing sleep after the final cycle
        if stop is not None and stop.is_set():
            break  # requested mid-cycle: cycle completed, exit now
        next_tick += interval_s
        now = clock()
        if now < next_tick:
            if stop is not None:
                stop.wait(next_tick - now)  # stop wakes the sleep early
            else:
                sleep(next_tick - now)
        else:
            # overran: coalesce missed ticks, fire immediately
            next_tick = now
    return cycles


def install_signal_handlers(
    stop: threading.Event, signals: tuple[int, ...] | None = None
) -> dict[int, object]:
    """Bind SIGINT/SIGTERM to ``stop.set()`` — the reference's graceful
    shutdown (``etl-service/src/main.py:43-56``) made cooperative: the
    handler only flags the event; :func:`run_scheduled` finishes the
    in-flight cycle and returns, instead of ``sys.exit`` tearing the
    process down mid-sync. Returns the previous handlers keyed by
    signal number so a caller (or test) can restore them."""
    import signal as _signal

    if signals is None:
        signals = (_signal.SIGINT, _signal.SIGTERM)
    previous: dict[int, object] = {}
    for sig in signals:
        previous[sig] = _signal.getsignal(sig)
        _signal.signal(sig, lambda _num, _frame: stop.set())
    return previous


def foreach_batch_sync(spark, sync_manager, interval_s: float = 60.0):
    """Structured Streaming driver for the sync cycle: a rate-source tick
    stream triggers one sync per micro-batch. Returns the started query;
    call ``.stop()`` to end. The 60 s processing-time trigger + single
    micro-batch executor gives A16's no-overlap + coalescing for free."""
    ticks = spark.readStream.format("rate").option("rowsPerSecond", 1).load()

    def _run(_batch_df, _batch_id) -> None:
        sync_manager.run_sync()

    return (
        ticks.writeStream.trigger(processingTime=f"{int(interval_s)} seconds")
        .foreachBatch(_run)
        .option("checkpointLocation", sync_manager.store_root + "/_checkpoint")
        .start()
    )
