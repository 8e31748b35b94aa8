"""Command-line drivers (parity: ``src/train.py``, ``src/predict.py``)."""
