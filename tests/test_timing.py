"""time_show formatting parity (CommonFunc.py:226-243)."""

from fcdgan_tpu.utils.timing import time_show


def test_time_show_formats():
    assert time_show(4.5) == "4.5s"
    assert time_show(64.5) == "1m 4.5s"
    assert time_show(3600) == "1h 0m 0.0s"
    # reference quirk (CommonFunc.py:237): hours use % 60, not % 24, so a
    # 25-hour duration prints as '1d 25h'
    assert time_show(90061.5) == "1d 25h 1m 1.5s"
