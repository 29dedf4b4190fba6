"""Helpers for TPU runner jobs: guarded device->host fetches.

Device->host transfers through the axon relay can hang indefinitely in some
session states; fetch in a daemon thread with a timeout so jobs always
terminate and on-device timing (block_until_ready) remains usable.
"""
import threading

import numpy as np


def fetch(x, timeout_s=60.0):
    """np.asarray(x) with a timeout; returns None when the transfer hangs."""
    box = {}

    def work():
        try:
            box["v"] = np.asarray(x)
        except Exception as e:  # noqa: BLE001
            box["e"] = repr(e)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    if "v" in box:
        return box["v"]
    if "e" in box:
        print("fetch error:", box["e"])
        return None
    print(f"fetch TIMED OUT after {timeout_s}s")
    return None
