from grappa_tpu.models import geometry, mm_energy

__all__ = ["geometry", "mm_energy"]
