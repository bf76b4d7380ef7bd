"""Generic IO utilities (reference ``src/utils.py:7-58``)."""

from __future__ import annotations

import os
import pickle
from typing import Dict

import pandas as pd


def save_txt(data_to_save: str, filepath: str, mode: str = "a") -> None:
    """Append text to a result log file (reference src/utils.py:7-12)."""
    os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
    with open(filepath, mode) as f:
        f.write(data_to_save + "\n")


def save_outputs(files_to_save: Dict[str, object], folder_path: str) -> None:
    """Pickle objects into a folder (reference src/utils.py:15-22)."""
    os.makedirs(folder_path, exist_ok=True)
    for name, obj in files_to_save.items():
        with open(os.path.join(folder_path, name + ".pkl"), "wb") as f:
            pickle.dump(obj, f)


def get_last_checkpoint(logdir: str = ".", prefix: str = "checkpoint") -> str:
    """Most recent checkpoint file by name sort (reference src/utils.py:25-32)."""
    logfiles = sorted(f for f in os.listdir(logdir) if f.startswith(prefix))
    if not logfiles:
        raise FileNotFoundError(f"no {prefix}* files in {logdir}")
    return os.path.join(logdir, logfiles[-1])


def read_data(file_path: str):
    """Read .csv / .gz / .pkl (reference src/utils.py:35-50)."""
    if file_path.endswith(".gz"):
        return pd.read_csv(
            file_path, compression="gzip", header=0, sep=";", quotechar='"'
        )
    if file_path.endswith(".csv"):
        return pd.read_csv(file_path)
    if file_path.endswith(".pkl"):
        with open(file_path, "rb") as f:
            return pickle.load(f)
    raise KeyError(f"File extension of {file_path} not recognized.")
