"""Benchmark: streaming recognition throughput on one TPU chip.

Measures the flagship path — MiniROAD batched-causal streaming inference
(the PREGO production configuration: rgb_anet_resnet50 + structurally-zero
flow, embedding 2048, hidden 1024, 86 classes) — over a batch of synthetic
full-length videos, chunked through the jitted scan with carried state,
exactly as the evaluator runs it.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N/10000}
Baseline: the >10k frames/sec/chip north star from BASELINE.md (the
reference's own eval FPS logging is broken — eval.py:35-36,77).

Resilience: the tunneled TPU transport can wedge for minutes at a time (an
in-process jax call then hangs forever and nothing in-process recovers it).
The measurement therefore runs in a CHILD process with a hard timeout; the
parent retries a few times with backoff so a transient tunnel outage at
capture time doesn't turn into a missing number for the whole round.

If the recognition capture succeeds on the FIRST attempt (clean tunnel
weather), the serving benchmarks in LLM_EXTRAS run too — each in its own
capped child — and their numbers are appended as extra keys on the same
JSON line, so the LLM serving path gets driver-attested alongside the
recognition headline. Any extra that fails or times out just drops its
keys (stderr note only); the headline is never at risk. PREGO_BENCH_LLM=0
disables the extras.
"""

import json
import os
import subprocess
import sys
import threading
import time

ATTEMPT_TIMEOUT = 420  # seconds per child attempt (cold remote compile ~100s)
MAX_ATTEMPTS = 3
BACKOFF = 45  # seconds between attempts


def _watchdog(seconds: float):
    """Fail fast with a clear message if the device op never returns."""

    def trip():
        print(
            f"bench watchdog: no result within {seconds:.0f}s — "
            "TPU transport appears hung",
            file=sys.stderr,
        )
        os._exit(3)

    t = threading.Timer(seconds, trip)
    t.daemon = True
    t.start()
    return t


def run_bench():
    _watchdog(ATTEMPT_TIMEOUT - 10)
    import numpy as np

    import jax
    import jax.numpy as jnp

    from prego_tpu.core import RecognitionConfig
    from prego_tpu.models.miniroad import MiniROAD
    from prego_tpu.train.evaluator import make_chunk_fn

    print(f"bench: devices={jax.devices()}", file=sys.stderr)

    cfg = RecognitionConfig.from_dict(
        {
            "rgb_type": "rgb_anet_resnet50",
            "flow_type": "flow_anet_resnet50",
            "embedding_dim": 2048,
            "hidden_dim": 1024,
            "num_layers": 1,
            "num_classes": 86,
            "dropout": 0.2,
        }
    )
    model = MiniROAD(cfg)
    params = model.init(jax.random.PRNGKey(0))

    # scale overrides let the harness plumbing be smoke-tested on CPU
    B = int(os.environ.get("PREGO_BENCH_B", 128))  # videos streamed concurrently
    CHUNK = int(os.environ.get("PREGO_BENCH_CHUNK", 512))
    N_CHUNKS = int(os.environ.get("PREGO_BENCH_NCHUNKS", 16))

    rng = np.random.default_rng(0)
    # one resident chunk re-fed each step: isolates device throughput from
    # synthetic-data generation; rotate two buffers so XLA can't CSE runs
    chunks = [
        jnp.asarray(rng.normal(0, 1, (B, CHUNK, 2048)).astype(np.float32))
        for _ in range(2)
    ]
    zero_flow = jnp.zeros((B, CHUNK, 2048), jnp.float32)
    # the fused Pallas recurrence (ops/gru_pallas.py) is the production path;
    # fall back to the XLA scan if the kernel can't compile on this platform
    chunk_fn = make_chunk_fn(model, flow_is_zero=True, backend="pallas")
    try:
        hidden = model.init_hidden(B)
        s, _ = chunk_fn(params, chunks[0], zero_flow, hidden)
        float(jnp.sum(s))
    except Exception:
        chunk_fn = make_chunk_fn(model, flow_is_zero=True, backend="scan")

    # NOTE: on the tunneled TPU platform block_until_ready returns before
    # execution finishes; a scalar checksum fetch is the only reliable sync
    # (and avoids timing the device->host transfer of the full scores).
    checksum = jax.jit(lambda s: jnp.sum(s))

    hidden = model.init_hidden(B)
    scores, hidden = chunk_fn(params, chunks[0], zero_flow, hidden)  # compile
    float(checksum(scores))
    print("bench: compiled, measuring", file=sys.stderr)

    hidden = model.init_hidden(B)
    t0 = time.perf_counter()
    for i in range(N_CHUNKS):
        scores, hidden = chunk_fn(params, chunks[i % 2], zero_flow, hidden)
    float(checksum(scores))  # forces the whole dependent chain
    elapsed = time.perf_counter() - t0

    frames = B * CHUNK * N_CHUNKS
    fps = frames / elapsed
    baseline = 10_000.0
    print(
        json.dumps(
            {
                "metric": "streaming_recognition_throughput",
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / baseline, 3),
            }
        )
    )


# optional serving extras appended to the headline JSON line so the LLM
# numbers get DRIVER-ATTESTED too (they were builder-measured only in r2).
# Each runs in its own capped child; any failure just drops its keys —
# the recognition headline is never at risk.
LLM_EXTRAS = (
    # (case name in scripts/bench_llm.py, key prefix, child timeout s)
    ("decode_b8", "llm_decode_b8_1b_bf16", 540),
    # the flagship b1 7B row, measured as the RECONCILIATION pair
    # (VERDICT r4 #1): plain int8 decode and the spec-baseline int8+kv8
    # config interleaved A/B/A/B in ONE process, so the official line
    # carries both b1 readings under identical weather — self-consistent
    # by construction (value = the decode_7b_int8 leg)
    ("reconcile_7b_b1", "llm_decode_b1_7b_int8", 900),  # TWO compile
    # signatures (plain + kv8) before the interleaved reps — 415 s clean
    # (chipq_r5a), watchdog-killed at 710 s in one slow patch (r5b)
    # the flagship PREGO serving number: 4-gen anticipation step,
    # step-batched x2, 1.5k-token shared context (1B-class shape)
    ("anticipation_step_sb2", "llm_anticipation_step_sb2", 600),
    # continuous batching on the PREGO-shaped shared-context burst
    # (prefix-sharing admission; r3 left serving-burst rows
    # builder-measured only)
    ("serving_cb_7b_ctx", "llm_serving_cb_7b_ctx", 720),  # registration
    # + warm pass + timed pass: 590 s in one slow patch (r5b validation)
    # the anticipation step at the reference's TRUE scale (7B int8 +
    # int8-KV); late so an exhausted budget drops it before the 1B rows
    ("anticipation_step_7b_int8_kv8_sb2", "llm_anticipation_step_7b_sb2", 720),
    # 7B batched serving row (b16 int8+kv8) — driver-attests the batch
    # sweep's representative point
    ("decode_7b_b16_int8_kv8", "llm_decode_7b_b16_int8_kv8", 600),
    # speculative decoding ceiling (oracle draft, acceptance 1) at the 7B
    # serving shape — the round-4 beyond-the-floor capability; the case
    # measures its own plain-greedy baseline in the same child, so the
    # attested row carries speedup_vs_plain directly
    ("spec_decode_7b_oracle_k4", "llm_spec_decode_7b_oracle_k4", 720),
    # speculation COMPOSED with the PREGO anticipation step (VERDICT r4
    # #3: one attested step-with-speculation number) — full-depth
    # self-draft, acceptance ~1 on fabricated weights, so the attested
    # row is the composed-path ceiling; LAST so budget exhaustion drops
    # it before the established rows
    ("anticipation_step_7b_spec_self32_k4",
     "llm_anticipation_step_7b_spec_self32_k4", 720),
)


def run_llm_child(case: str):
    timeout_s = float(os.environ.get("PREGO_LLM_CHILD_TIMEOUT", "600"))
    _watchdog(timeout_s - 10)
    import json as _json

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from bench_llm import CASES, _weather_probe

    weather = _weather_probe()  # fixed-reference index BEFORE the case body
    row = CASES[case](False)
    if isinstance(row, dict):
        row["weather_ms"] = weather
    print(_json.dumps(row))


def _run_llm_case(case: str, timeout_s: float):
    """One capped child run of a bench_llm case; returns the parsed row
    dict or None."""
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--llm-child", case],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            timeout=timeout_s,
            text=True,
            env={**os.environ, "PREGO_LLM_CHILD_TIMEOUT": str(timeout_s)},
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("{")), None
        )
        if proc.returncode == 0 and line:
            print(
                f"bench: LLM extra {case} ok in {time.time() - t0:.0f}s: {line}",
                file=sys.stderr,
            )
            return json.loads(line)
        print(
            f"bench: LLM extra {case} rc={proc.returncode}; stderr tail: "
            + " | ".join(proc.stderr.splitlines()[-2:]),
            file=sys.stderr,
        )
    except subprocess.TimeoutExpired:
        print(
            f"bench: LLM extra {case} timed out after {timeout_s}s",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001 — extras must never kill the bench
        print(f"bench: LLM extra {case} failed: {e}", file=sys.stderr)
    return None


def _extras_from_row(prefix: str, row: dict) -> dict:
    extras = {}
    if "speedup_vs_plain" in row and "tok/s" in row.get("unit", ""):
        # speculative-decode rows
        extras[f"{prefix}_tok_s"] = row["value"]
        extras[f"{prefix}_speedup_vs_plain"] = row["speedup_vs_plain"]
        extras[f"{prefix}_acceptance"] = row["acceptance_rate"]
        if "spread_pct" in row:
            extras[f"{prefix}_spread_pct"] = row["spread_pct"]
    elif "speedup_vs_plain" in row:  # composed spec-anticipation step:
        # ms/step plus the same-window plain leg and acceptance
        extras[f"{prefix}_ms_per_step"] = row["value"]
        extras[f"{prefix}_plain_ms_per_step"] = row["plain_ms_per_step"]
        extras[f"{prefix}_speedup_vs_plain"] = row["speedup_vs_plain"]
        extras[f"{prefix}_acceptance"] = row["acceptance_rate"]
    elif "tok/s" in row.get("unit", ""):  # serving-burst rows
        extras[f"{prefix}_useful_tok_s"] = row["value"]
        if "prefix_hits" in row:
            extras[f"{prefix}_prefix_hits"] = row["prefix_hits"]
        if "slot_utilization" in row:
            extras[f"{prefix}_slot_util"] = row["slot_utilization"]
    else:
        extras[f"{prefix}_ms_per_step"] = row["value"]
    if "kv8_ms_per_step" in row:  # reconciliation pair: the interleaved
        # int8+kv8 leg rides the same official line as the plain leg
        extras[f"{prefix}_kv8_ms_per_step"] = row["kv8_ms_per_step"]
        extras[f"{prefix}_kv8_over_plain_pct"] = row["kv8_over_plain_pct"]
    if "tok_per_s" in row:
        extras[f"{prefix}_tok_s"] = row["tok_per_s"]
    if "pct_of_floor" in row:
        extras[f"{prefix}_pct_of_floor"] = row["pct_of_floor"]
    if "weather_ms" in row:
        extras[f"{prefix}_weather_ms"] = row["weather_ms"]
    return extras


def _collect_llm_extras(weather_clean: bool) -> dict:
    """Run each serving case in a capped child process; any miss is
    silently dropped (reported on stderr only). Skipped entirely when the
    recognition capture itself needed retries (tunnel bad weather) or
    PREGO_BENCH_LLM=0.

    WEATHER SENTINEL (VERDICT r4 #1): every child probes a fixed
    transport-RTT reference before its case body and reports it as
    weather_ms.  After the first pass, any case whose weather index sits
    >1.5x the session median gets ONE re-run (budget permitting) and the
    better-weather reading wins — a per-case tunnel slow patch no longer
    poisons the attested line silently (BENCH_r04's 14.5-vs-10.81 7B b1
    self-contradiction)."""
    if os.environ.get("PREGO_BENCH_LLM", "1") == "0":
        return {}
    if not weather_clean:
        print("bench: skipping LLM extras (tunnel weather)", file=sys.stderr)
        return {}
    # global deadline across ALL extras (default 55 min — eight cases at
    # the measured ~5-7.5 min/child, which sums to ~54 min clean, plus
    # slack for ONE slow-patch retry): the driver's capture window must
    # never be consumed by serving-bench retries; cases are ordered so
    # budget exhaustion drops the newest rows first
    deadline = time.time() + float(os.environ.get("PREGO_BENCH_LLM_BUDGET", "3300"))
    rows = {}  # case -> (prefix, row)
    for case, prefix, timeout_s in LLM_EXTRAS:
        if time.time() + timeout_s > deadline:
            print(
                f"bench: LLM extra {case} skipped (extras budget exhausted)",
                file=sys.stderr,
            )
            continue
        # One retry after a backoff: the axon server frees a just-exited
        # client's HBM asynchronously, so a big-memory case launched
        # seconds after the previous child can hit RESOURCE_EXHAUSTED
        # that a 30 s wait cures (observed with decode_7b_int8 right
        # after decode_b8).
        for attempt in (1, 2):
            row = _run_llm_case(case, timeout_s)
            if row is not None:
                rows[case] = (prefix, row)
                break
            if attempt == 1:
                if time.time() + 30 + timeout_s > deadline:
                    print(
                        f"bench: LLM extra {case} retry skipped (extras "
                        "budget exhausted)",
                        file=sys.stderr,
                    )
                    break
                time.sleep(30)

    weathers = sorted(
        r["weather_ms"] for _, r in rows.values() if "weather_ms" in r
    )
    if weathers:
        median_w = weathers[len(weathers) // 2]
        print(
            f"bench: session weather median {median_w} ms over "
            f"{len(weathers)} cases",
            file=sys.stderr,
        )
        for case, prefix, timeout_s in LLM_EXTRAS:
            if case not in rows:
                continue
            w = rows[case][1].get("weather_ms")
            if w is None or w <= 1.5 * median_w:
                continue
            if time.time() + 30 + timeout_s > deadline:
                print(
                    f"bench: weather re-run of {case} skipped (budget)",
                    file=sys.stderr,
                )
                continue
            print(
                f"bench: {case} weather {w} ms > 1.5x median {median_w} — "
                "re-running once",
                file=sys.stderr,
            )
            time.sleep(30)
            row2 = _run_llm_case(case, timeout_s)
            if row2 is not None and row2.get("weather_ms", w) < w:
                rows[case] = (prefix, row2)

    extras = {}
    for prefix, row in rows.values():
        extras.update(_extras_from_row(prefix, row))
    return extras


def main():
    if "--child" in sys.argv:
        return run_bench()
    if "--llm-child" in sys.argv:
        return run_llm_child(sys.argv[sys.argv.index("--llm-child") + 1])

    for attempt in range(1, MAX_ATTEMPTS + 1):
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                timeout=ATTEMPT_TIMEOUT,
                text=True,
            )
        except subprocess.TimeoutExpired:
            print(
                f"bench attempt {attempt}/{MAX_ATTEMPTS}: child timed out "
                f"after {ATTEMPT_TIMEOUT}s (TPU transport hung)",
                file=sys.stderr,
            )
        else:
            line = next(
                (l for l in proc.stdout.splitlines() if l.startswith("{")), None
            )
            if proc.returncode == 0 and line:
                obj = json.loads(line)
                obj.update(_collect_llm_extras(weather_clean=(attempt == 1)))
                print(json.dumps(obj))
                return 0
            print(
                f"bench attempt {attempt}/{MAX_ATTEMPTS}: child rc="
                f"{proc.returncode} after {time.time() - t0:.0f}s; stderr tail: "
                + " | ".join(proc.stderr.splitlines()[-3:]),
                file=sys.stderr,
            )
        if attempt < MAX_ATTEMPTS:
            time.sleep(BACKOFF)
    print("bench: all attempts failed — TPU transport unavailable", file=sys.stderr)
    return 3


if __name__ == "__main__":
    sys.exit(main())
