"""Checkpoint / resume for progressive renders and optimizations.

The reference's only resumable state — the progressive accumulator + spp
counter (3. PathTracer/renderer.cpp:117-131,167) — is never persisted there
(its app-state serializer is `#if 0`, template.cpp:142-165).  Here the film
pytree {accum, spp} and optional optimization params are saved as .npz so
long renders survive preemption (SURVEY.md §5 failure recovery).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from cpu_ray_tracer_tpu.core.film import Film

FORMAT_VERSION = 1


def save_film(path: str, film: Film, extra: dict | None = None) -> None:
    arrays = {
        "__version__": np.int64(FORMAT_VERSION),
        "accum": np.asarray(jax.device_get(film.accum)),
        "spp": np.asarray(jax.device_get(film.spp)),
    }
    for k, v in (extra or {}).items():
        arrays["extra_" + k] = np.asarray(jax.device_get(v))
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_film(path: str) -> tuple[Film, dict]:
    data = np.load(path)
    assert int(data["__version__"]) == FORMAT_VERSION
    film = Film(accum=jnp.asarray(data["accum"]), spp=jnp.asarray(data["spp"]))
    extra = {
        k[len("extra_") :]: jnp.asarray(data[k])
        for k in data.files
        if k.startswith("extra_")
    }
    return film, extra
