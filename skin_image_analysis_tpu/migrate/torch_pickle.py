"""Safe reader for torch ``.pth`` files — no torch, no code execution.

The reference persists trained models as WHOLE-MODULE pickles
(``torch.save(model, 'session_model.pth')``, tone_bias_model.py:305-316),
which on load would (a) require the reference's model classes importable
and (b) execute arbitrary pickled code. This module parses the torch
zipfile serialization format directly:

- every class the pickle references resolves to an inert *stub* type that
  merely records its ``(module, qualname)`` and captured state — nothing
  from the pickle is ever imported or called except an allow-list of pure
  data constructors (``collections.OrderedDict``, ``builtins.set`` …) and
  our own reimplementations of torch's tensor-rebuild helpers;
- tensor storages load straight from the zip entries into numpy arrays
  (dtype from the pickled storage-class name, bfloat16 via ml_dtypes).

The result is the original object graph with ``nn.Module`` instances as
:class:`Stub` objects whose ``_parameters`` / ``_buffers`` / ``_modules``
dicts hold numpy arrays — everything needed to rebuild the model here
(see :mod:`skin_image_analysis_tpu.migrate.reference`).
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict
from typing import Any, Iterator

import numpy as np

__all__ = [
    "Stub",
    "load_pth",
    "named_modules",
    "named_tensors",
    "TorchPickleError",
]


class TorchPickleError(ValueError):
    """Normalized failure type for anything wrong with a .pth file."""


class Stub:
    """Inert stand-in for any pickled class we refuse to import.

    Records the original class identity in ``_pickle_module`` /
    ``_pickle_name`` (class attributes of the generated subtype) and, when
    the pickle CALLS the class (REDUCE), the call args in ``_args``.
    Instance state lands in ``__dict__`` via pickle's default
    ``__setstate__`` fallback.
    """

    _pickle_module: str = "?"
    _pickle_name: str = "?"

    def __new__(cls, *args: Any, **kwargs: Any) -> "Stub":
        inst = object.__new__(cls)
        if args or kwargs:
            inst.__dict__["_args"] = (args, kwargs)
        return inst

    def __init__(self, *args: Any, **kwargs: Any) -> None:  # noqa: D401
        pass

    # torch pickles some instances via __setstate__-less protocols that
    # pass (dict, slots) tuples; mirror pickle's own fallback exactly.
    def __setstate__(self, state: Any) -> None:
        if isinstance(state, tuple) and len(state) == 2:
            d, slots = state
            if d:
                self.__dict__.update(d)
            if slots:
                self.__dict__.update(slots)
        elif isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<Stub {self._pickle_module}.{self._pickle_name}>"


_STUB_CACHE: dict[tuple[str, str], type] = {}


def _stub_class(module: str, name: str) -> type:
    key = (module, name)
    cls = _STUB_CACHE.get(key)
    if cls is None:
        cls = type(
            f"Stub_{name}",
            (Stub,),
            {"_pickle_module": module, "_pickle_name": name},
        )
        _STUB_CACHE[key] = cls
    return cls


def _storage_dtype(name: str) -> np.dtype:
    table = {
        "FloatStorage": np.float32,
        "DoubleStorage": np.float64,
        "HalfStorage": np.float16,
        "LongStorage": np.int64,
        "IntStorage": np.int32,
        "ShortStorage": np.int16,
        "CharStorage": np.int8,
        "ByteStorage": np.uint8,
        "BoolStorage": np.bool_,
    }
    if name in table:
        return np.dtype(table[name])
    if name == "BFloat16Storage":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    raise TorchPickleError(f"unsupported torch storage type {name!r}")


def _rebuild_tensor_v2(
    storage: np.ndarray,
    storage_offset: int,
    size: tuple,
    stride: tuple,
    requires_grad: bool = False,
    backward_hooks: Any = None,
    metadata: Any = None,
) -> np.ndarray:
    """Torch-free ``torch._utils._rebuild_tensor_v2``: view the flat
    storage at (offset, size, stride) — strides are in ELEMENTS — and
    copy out so the result owns its memory."""
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    storage_offset = int(storage_offset)
    itemsize = storage.dtype.itemsize
    # The size/stride/offset come from the (untrusted) pickle; as_strided
    # trusts them blindly, so bound-check against the actual storage
    # before building the view — otherwise a corrupt/malicious file reads
    # out-of-bounds process memory instead of raising.
    if storage_offset < 0 or any(s < 0 for s in size) or any(
        s < 0 for s in stride
    ):
        raise TorchPickleError(
            f"tensor with negative offset/size/stride "
            f"(offset={storage_offset}, size={size}, stride={stride})"
        )
    if not size:
        if storage_offset >= storage.size:
            raise TorchPickleError(
                f"scalar tensor offset {storage_offset} outside storage "
                f"of {storage.size} elements"
            )
        return storage[storage_offset : storage_offset + 1].copy().reshape(())
    last = storage_offset + sum(
        (s - 1) * st for s, st in zip(size, stride) if s > 0
    )
    if min(size) == 0:
        return np.empty(size, dtype=storage.dtype)
    if last >= storage.size:
        raise TorchPickleError(
            f"tensor view (offset={storage_offset}, size={size}, "
            f"stride={stride}) exceeds storage of {storage.size} elements"
        )
    view = np.lib.stride_tricks.as_strided(
        storage[storage_offset:],
        shape=size,
        strides=tuple(s * itemsize for s in stride),
    )
    return np.array(view, dtype=storage.dtype)


def _rebuild_parameter(data: np.ndarray, requires_grad: bool = True,
                       backward_hooks: Any = None) -> np.ndarray:
    return data


# (module, name) -> replacement for the pickle's GLOBAL lookups. Only
# pure data constructors and our own tensor rebuilders — never anything
# with side effects.
_ALLOWED: dict[tuple[str, str], Any] = {
    ("collections", "OrderedDict"): OrderedDict,
    ("builtins", "set"): set,
    ("builtins", "frozenset"): frozenset,
    ("builtins", "bytearray"): bytearray,
    ("builtins", "complex"): complex,
    ("torch", "Size"): tuple,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
}


class _SafeUnpickler(pickle.Unpickler):
    def __init__(self, data: bytes, load_storage) -> None:
        super().__init__(io.BytesIO(data))
        self._load_storage = load_storage

    def find_class(self, module: str, name: str) -> Any:
        repl = _ALLOWED.get((module, name))
        if repl is not None:
            return repl
        return _stub_class(module, name)

    def persistent_load(self, pid: Any) -> Any:
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise TorchPickleError(f"unknown persistent id {pid!r}")
        _, storage_type, key, _location, numel = pid
        type_name = getattr(storage_type, "_pickle_name", None) or getattr(
            storage_type, "__name__", str(storage_type)
        )
        return self._load_storage(str(key), _storage_dtype(type_name),
                                  int(numel))


def load_pth(path: str) -> Any:
    """Parse a torch zipfile ``.pth`` and return the pickled object graph
    with stubbed classes and numpy tensors. Raises
    :class:`TorchPickleError` on anything that is not a well-formed
    torch zip archive (including the pre-1.6 legacy stream format)."""
    try:
        zf = zipfile.ZipFile(path)
    except (zipfile.BadZipFile, OSError) as e:
        raise TorchPickleError(
            f"{path}: not a torch zipfile checkpoint (legacy pre-1.6 "
            f"torch.save streams are not supported): {e}"
        ) from e
    with zf:
        names = zf.namelist()
        pkl_entries = [n for n in names if n.endswith("/data.pkl")]
        if not pkl_entries:
            raise TorchPickleError(f"{path}: no data.pkl in archive")
        prefix = pkl_entries[0][: -len("data.pkl")]

        def load_storage(key: str, dtype: np.dtype, numel: int) -> np.ndarray:
            entry = f"{prefix}data/{key}"
            try:
                raw = zf.read(entry)
            except KeyError as e:
                raise TorchPickleError(
                    f"{path}: missing storage entry {entry}"
                ) from e
            need = numel * dtype.itemsize
            if len(raw) < need:
                raise TorchPickleError(
                    f"{path}: storage {key} truncated "
                    f"({len(raw)} < {need} bytes)"
                )
            return np.frombuffer(raw[:need], dtype=dtype).copy()

        try:
            data = zf.read(pkl_entries[0])
            return _SafeUnpickler(data, load_storage).load()
        except TorchPickleError:
            raise
        except Exception as e:
            raise TorchPickleError(f"{path}: corrupt pickle: {e}") from e


def _module_children(stub: Any) -> "OrderedDict[str, Any]":
    mods = getattr(stub, "_modules", None)
    if isinstance(mods, dict):
        return OrderedDict(
            (k, v) for k, v in mods.items() if v is not None
        )
    return OrderedDict()


def named_modules(
    root: Any, prefix: str = "", _memo: set[int] | None = None
) -> Iterator[tuple[str, Any]]:
    """Walk a stubbed ``nn.Module`` graph in definition order, yielding
    ``(dotted_path, stub)`` — the torch ``Module.named_modules``
    contract, reconstructed from the pickled ``_modules`` dicts.

    Like torch, an instance referenced from two parents (weight tying)
    is yielded once; the memo also terminates on cyclic graphs a corrupt
    pickle could encode (pickle memos support cycles)."""
    if _memo is None:
        _memo = set()
    if id(root) in _memo:
        return
    _memo.add(id(root))
    yield prefix, root
    for name, child in _module_children(root).items():
        sub = f"{prefix}.{name}" if prefix else name
        yield from named_modules(child, sub, _memo)


def named_tensors(root: Any) -> "OrderedDict[str, np.ndarray]":
    """The ``state_dict()`` equivalent: every parameter/buffer as a numpy
    array keyed by its dotted path, in module definition order."""
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for path, mod in named_modules(root):
        for attr in ("_parameters", "_buffers"):
            entries = getattr(mod, attr, None)
            if not isinstance(entries, dict):
                continue
            for name, value in entries.items():
                if value is None:
                    continue
                key = f"{path}.{name}" if path else name
                if not isinstance(value, np.ndarray):
                    raise TorchPickleError(
                        f"{key}: expected a tensor, got {type(value)!r}"
                    )
                out[key] = value
    return out


def stub_kind(stub: Any) -> str:
    """The pickled class name of a stub (e.g. ``Conv2d``)."""
    return getattr(stub, "_pickle_name", type(stub).__name__)
