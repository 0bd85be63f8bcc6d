"""Placeholder plots module (the reference ships an empty
``p2igan_bench/metrics/plots.py``). Online-run visualization lives in the
trainer's example-image artifacts (``training/trainer.py::_log_examples``);
offline figures live in ``experiments/exp2.py`` and ``experiments/exp3.py``.
"""
