"""Command-line entry points (reference: train.py / test.py / inferencer.py /
triage.py and the metric eval_schedule scripts)."""
