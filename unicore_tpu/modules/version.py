"""version banner (modules/version.rs:4-18)."""

from __future__ import annotations

import unicore_tpu

LOGO = r"""
 __  __     __   __     __     ______     ______     ______     ______
/\ \/\ \   /\ "-.\ \   /\ \   /\  ___\   /\  __ \   /\  == \   /\  ___\
\ \ \_\ \  \ \ \-.  \  \ \ \  \ \ \____  \ \ \/\ \  \ \  __<   \ \  __\
 \ \_____\  \ \_\\"\_\  \ \_\  \ \_____\  \ \_____\  \ \_\ \_\  \ \_____\
  \/_____/   \/_/ \/_/   \/_/   \/_____/   \/_____/   \/_/ /_/   \/_____/
                                                        TPU-native edition
"""


def run() -> None:
    print(LOGO)
    print(f"unicore-tpu version {unicore_tpu.__version__}")
    print()
    print(unicore_tpu.CITATION)
