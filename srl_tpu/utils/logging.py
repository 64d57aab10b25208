"""Colored console logging + misc host utilities.

Provides the srl_zoo.utils surface the reference imports everywhere
(printGreen/printYellow/printRed/createFolder, SURVEY §2.9).
"""
from __future__ import annotations

import os


def _c(code: int, text: str) -> str:
    return f"\033[{code}m{text}\033[0m"


def printGreen(text: str):
    print(_c(32, text))


def printYellow(text: str):
    print(_c(33, text))


def printRed(text: str):
    print(_c(31, text))


def printBlue(text: str):
    print(_c(34, text))


def createFolder(path: str, exist_warning: str = None):
    try:
        os.makedirs(path)
    except OSError:
        if exist_warning:
            printYellow(exist_warning)


def softmax(x):
    """Numerically stable softmax (rl_baselines/utils.py:244-251)."""
    import numpy as np

    e = np.exp(x - np.max(x, axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)
