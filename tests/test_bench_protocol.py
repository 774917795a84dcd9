"""Pin bench.py's metric protocol: the driver's BENCH_r{N}.json records
are diffed round-over-round by metric NAME, so an accidental rename (or
a shape/step count leaking back into an f-string label, as in rounds
1-2) silently breaks the longitudinal record. These tests freeze the
protocol at the source level — renaming or re-ordering a metric now
requires touching the expected lists here, i.e. a deliberate decision.
"""

import re
from pathlib import Path

BENCH_SRC = (Path(__file__).resolve().parent.parent / "bench.py").read_text()

# The scheduler list: names the driver sees as top-level metric phases,
# in execution order (headline MUST be first — it is re-emitted verbatim
# to close a full run, and an early driver timeout keeps the prefix).
EXPECTED_SCHEDULE = [
    "rtf_1000step_b1",
    "rtf_1000step_b1_60s",
    "steps_per_sec_b32",
    "rtf_bucketed_mixed",
    "train_steps_per_sec",
    "train_loss_drop_overfit300",
    "rtf_dpmpp25step_b1_60s",
    "sp_flash_on_chip_maxerr",
    # flagship 6-minute metric deliberately precedes the other isolated
    # metric (parity) and the cheaper 6-minute variants: under budget
    # pressure the bonus lines starve, not it
    "rtf_1000step_b1_360s",
    "parity_mae_vs_torch",
    "rtf_dpmpp25step_b1_360s",
    "rtf_1000step_streaming_b1_360s",
    "train_steps_per_sec_b1_360s",
    # most expensive bonus line runs last: it starves first
    "rtf_1000step_streaming_b1_1800s",
]

# Every value-bearing label bench.py can emit (some runners emit several
# lines, e.g. the MFU pair alongside the 60 s RTF).
EXPECTED_EMITTED = {
    "rtf_1000step_b1",
    "rtf_1000step_b1_60s",
    "mfu_denoise_60s_pct",
    "mfu_denoise_60s_executed_pct",
    "steps_per_sec_b1",
    "steps_per_sec_b32",
    "rtf_1000step_b32",
    "rtf_bucketed_mixed",
    "train_steps_per_sec",
    "rtf_1000step_b1_360s",
    "train_steps_per_sec_b1_360s",
    "rtf_dpmpp25step_b1_60s",
    "rtf_dpmpp25step_b1_360s",
    "rtf_1000step_streaming_b1_360s",
    "rtf_1000step_streaming_b1_1800s",
    "parity_mae_vs_torch",
    "sp_flash_on_chip_maxerr",
    # round-5 evidence lines: bucketed median spread band, the analytic
    # exact-mode ceiling companion, and the learning-dynamics metrics
    "rtf_bucketed_mixed_spread",
    "rtf_1000step_b1_360s_ceiling",
    # head/tail means of the 50-step production-lr chain (5 steps each
    # on TPU; the names carry the averaging so a record reader doesn't
    # mistake them for 50-step averages)
    "train_loss_first5_of50",
    "train_loss_last5_of50",
    "train_loss_drop_overfit300",
}


def _schedule_names():
    block = re.search(r"metrics = \[(.*?)\]", BENCH_SRC, re.S).group(1)
    return re.findall(r'\(\s*"([a-z0-9_]+)"', block)


def test_schedule_is_frozen_protocol():
    assert _schedule_names() == EXPECTED_SCHEDULE


def test_emitted_labels_are_frozen_protocol():
    emitted = set(re.findall(r'_emit\(\s*\n?\s*"([a-z0-9_]+)"', BENCH_SRC))
    assert emitted == EXPECTED_EMITTED


def test_labels_are_static_strings():
    # No f-string metric names: a label like f"rtf_{steps}step" makes
    # off-TPU and on-TPU records field-incomparable (VERDICT r3 weak #6).
    assert not re.search(r'_emit\(\s*\n?\s*f"', BENCH_SRC)


def test_headline_runs_first_and_closes_the_run():
    assert _schedule_names()[0] == "rtf_1000step_b1"
    # the closing re-emit keys on the headline label
    assert '"rtf_1000step_b1"' in BENCH_SRC.split("_VALUE_LINES", 2)[-1]
