"""CenterNet square-detection smoke test (the BASELINE.json validation
config, named after the reference's ``tests/centernet_square_detection.py``).

The reference version trains until a human sees the heatmap lock on; this
automated rebuild trains a tiny CenterNet on procedurally generated
rotated squares and asserts (a) the loss drops by >2x and (b) the decoded
peak lands on the square's center cell.  CPU-runnable, no external data.

Run directly (``python tests/centernet_square_detection.py``) or via
pytest (it re-exports the integration test).
"""

from tests.test_integration_train import test_centernet_learns_squares  # noqa: F401

if __name__ == "__main__":
    import tests.conftest  # noqa: F401  (forces the CPU backend)

    test_centernet_learns_squares()
    print("centernet_square_detection: PASS")
