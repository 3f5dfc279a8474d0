"""Hardware strong-scaling ceiling probe for BASELINE.md / bench.py --scaling.

Runs the SAME fixed quantum of single-process work at increasing process
widths and reports per-process throughput degradation — the host's own
strong-scaling ceiling, independent of Ray or the engine. Two workload
classes:

- "blas":  cache-resident matmul (pure CPU; isolates clock/steal effects)
- "mixed": the engine's op mix — numpy temporaries, string encode, pandas
  sort (allocation + bandwidth heavy; what the pipeline actually does)

On the round-3 sandbox VM the blas class scales ~linearly to 32 procs
while the mixed class collapses above ~16 (hypervisor CPU steal measured
at 30-50% during allocation-heavy 32-wide phases, ~0% at <=16) — evidence
that the measured pipeline efficiency at 8-vs-32 is bounded by the HOST,
not the engine's plan.

CLI:   python tools/host_ceiling_probe.py [width ...]     (default 4 8 16 32)
API:   probe(widths, repeat=..., settle=...) -> per-class per-width table —
       used by ``bench.py --scaling`` to take a host reading in the SAME
       measurement window as each pipeline leg (round-3 verdict: the
       efficiency claim must be window-controlled, not inferred from
       probes taken hours apart).
"""

import json
import multiprocessing as mp
import sys
import time


def work_blas(q, repeat: int = 60):
    import numpy as np

    a = np.random.rand(600, 600)
    t0 = time.perf_counter()
    for _ in range(repeat):
        np.dot(a, a)
    q.put(time.perf_counter() - t0)


def work_mixed(q, repeat: int = 6):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(0)
    strs = np.array(
        ["".join(rng.choice(list("abcdef "), 80)) for _ in range(20000)],
        dtype=object,
    )
    t0 = time.perf_counter()
    for _ in range(repeat):
        big = np.frombuffer("".join(strs).encode("utf-32-le"), dtype=np.uint32)
        w = np.lib.stride_tricks.sliding_window_view(big, 8).astype(np.uint64)
        h = (w * np.uint64(31)).sum(axis=1, dtype=np.uint64)
        df = pd.DataFrame({"k": strs, "v": h[: len(strs)]})
        df.sort_values("k", kind="stable")
    q.put(time.perf_counter() - t0)


_WORK = {"blas": work_blas, "mixed": work_mixed}
_DEFAULT_REPEAT = {"blas": 60, "mixed": 6}


def measure(fn, nproc: int, repeat: int) -> float:
    """Mean per-process wall seconds for the fixed quantum at width nproc."""
    q = mp.Queue()
    procs = [mp.Process(target=fn, args=(q, repeat)) for _ in range(nproc)]
    for p in procs:
        p.start()
    times = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(times) / len(times)


def probe(
    widths: list[int],
    classes: tuple[str, ...] = ("blas", "mixed"),
    repeat_scale: float = 1.0,
    settle: float = 3.0,
) -> dict:
    """One host-ceiling reading: per class, per width, per-process seconds
    for the fixed quantum plus throughput relative to the FIRST width.

    ``repeat_scale`` shrinks the quantum for fast window-paired readings
    inside bench.py (0.5 ≈ 1–2 s per measurement on this VM); ``settle``
    is the pause between width levels."""
    out: dict = {}
    for name in classes:
        fn = _WORK[name]
        repeat = max(1, round(_DEFAULT_REPEAT[name] * repeat_scale))
        base = None
        res = {}
        for n in widths:
            t = measure(fn, n, repeat)
            if base is None:
                base = t
            res[n] = {
                "per_proc_sec": round(t, 3),
                "rel_throughput": round(base / t, 3),
            }
            if settle:
                time.sleep(settle)
        out[name] = res
    return out


if __name__ == "__main__":
    widths = [int(x) for x in (sys.argv[1:] or ["4", "8", "16", "32"])]
    print(json.dumps(probe(widths), indent=1))
