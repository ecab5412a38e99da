"""Toolkit helpers — parity with the reference's ``datachain.toolkit``
namespace (/root/reference/src/datachain/toolkit/__init__.py), which exposes
``train_test_split`` as a free function taking the chain first."""

from .split import train_test_split

__all__ = ["train_test_split"]
