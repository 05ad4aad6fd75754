"""A first-party stand-in for the openmm API surface used by grappa_tpu.

The real openmm is not installable in this environment, so the import-gated
wrapper code (grappa_tpu/wrappers/openmm_wrapper.py, hyp_dop.py) could never
execute. This double implements exactly the classes/functions those wrappers
touch — System, the three bonded forces, NonbondedForce, Topology, Context
with a numpy energy/force evaluator — with openmm's semantics:

  * unit algebra backed by grappa_tpu.units (raw numbers mean openmm's md
    unit system: nm, kJ/mol, radian, elementary charge, ps)
  * HarmonicBondForce  E = k/2 (r - r0)^2
  * HarmonicAngleForce E = k/2 (theta - theta0)^2
  * PeriodicTorsionForce E = k (1 + cos(n phi - phase))
  * NonbondedForce: Coulomb + Lennard-Jones over all pairs, Lorentz-
    Berthelot combination, pair exceptions REPLACE the default interaction
  * Context forces by central finite differences of the total energy (f64)

Install with `install()` (registers openmm/openmm.unit/openmm.app in
sys.modules so importlib.util.find_spec finds them), remove with
`uninstall()`. Test-only code: the shipped wrappers are unchanged.
"""
from __future__ import annotations

import importlib.machinery
import sys
import types
from typing import Dict, List, Optional

import numpy as np

from grappa_tpu import units as U

# openmm md-unit-system defaults for raw (unit-less) numbers
_NM = U.nanometer
_KJ = U.kilojoule_per_mole
_RAD = U.radian
_E0 = U.elementary_charge
_PS = U.picosecond

# evaluation units
_ANG = U.angstrom
_KCAL = U.kilocalorie_per_mole

# ONE_4PI_EPS0 = 138.935456 kJ mol^-1 nm e^-2  ->  kcal mol^-1 A e^-2
COULOMB_CONSTANT = 138.935456 / 4.184 * 10.0

_FD_EPS = 1e-4          # finite-difference step (A) for Context forces


def _q(value, default_unit: U.Unit) -> U.Quantity:
    if isinstance(value, U.Quantity):
        return value
    return U.Quantity(value, default_unit)


# ---------------------------------------------------------------------------
# forces
class Force:
    def __init__(self):
        self._name = self.__class__.__name__

    def setName(self, name: str):
        self._name = name

    def getName(self) -> str:
        return self._name

    def _energy(self, xyz: np.ndarray) -> float:   # xyz (n, 3) in A
        return 0.0


class CMMotionRemover(Force):
    pass


class HarmonicBondForce(Force):
    def __init__(self):
        super().__init__()
        self._bonds: List[list] = []

    def addBond(self, a, b, length, k) -> int:
        self._bonds.append([int(a), int(b), _q(length, _NM),
                            _q(k, _KJ / _NM ** 2)])
        return len(self._bonds) - 1

    def getNumBonds(self) -> int:
        return len(self._bonds)

    def getBondParameters(self, i: int):
        return tuple(self._bonds[i])

    def setBondParameters(self, i: int, a, b, length, k):
        self._bonds[i] = [int(a), int(b), _q(length, _NM),
                          _q(k, _KJ / _NM ** 2)]

    def _energy(self, xyz):
        e = 0.0
        for a, b, eq, k in self._bonds:
            r = float(np.linalg.norm(xyz[a] - xyz[b]))
            e += 0.5 * k.value_in_unit(_KCAL / _ANG ** 2) * (
                r - eq.value_in_unit(_ANG)) ** 2
        return e


class HarmonicAngleForce(Force):
    def __init__(self):
        super().__init__()
        self._angles: List[list] = []

    def addAngle(self, a, b, c, angle, k) -> int:
        self._angles.append([int(a), int(b), int(c), _q(angle, _RAD),
                             _q(k, _KJ / _RAD ** 2)])
        return len(self._angles) - 1

    def getNumAngles(self) -> int:
        return len(self._angles)

    def getAngleParameters(self, i: int):
        return tuple(self._angles[i])

    def setAngleParameters(self, i: int, a, b, c, angle, k):
        self._angles[i] = [int(a), int(b), int(c), _q(angle, _RAD),
                           _q(k, _KJ / _RAD ** 2)]

    def _energy(self, xyz):
        e = 0.0
        for a, b, c, eq, k in self._angles:
            v1 = xyz[a] - xyz[b]
            v2 = xyz[c] - xyz[b]
            cos = np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2))
            theta = float(np.arccos(np.clip(cos, -1.0, 1.0)))
            e += 0.5 * k.value_in_unit(_KCAL / _RAD ** 2) * (
                theta - eq.value_in_unit(_RAD)) ** 2
        return e


def _dihedral(p0, p1, p2, p3) -> float:
    b1 = p1 - p0
    b2 = p2 - p1
    b3 = p3 - p2
    n1 = np.cross(b1, b2)
    n2 = np.cross(b2, b3)
    m = np.cross(n1, b2 / np.linalg.norm(b2))
    return float(np.arctan2(np.dot(m, n2), np.dot(n1, n2)))


class PeriodicTorsionForce(Force):
    def __init__(self):
        super().__init__()
        self._torsions: List[list] = []

    def addTorsion(self, a, b, c, d, periodicity, phase, k) -> int:
        self._torsions.append([int(a), int(b), int(c), int(d),
                               int(periodicity), _q(phase, _RAD), _q(k, _KJ)])
        return len(self._torsions) - 1

    def getNumTorsions(self) -> int:
        return len(self._torsions)

    def getTorsionParameters(self, i: int):
        return tuple(self._torsions[i])

    def setTorsionParameters(self, i: int, a, b, c, d, periodicity, phase, k):
        self._torsions[i] = [int(a), int(b), int(c), int(d),
                             int(periodicity), _q(phase, _RAD), _q(k, _KJ)]

    def _energy(self, xyz):
        e = 0.0
        for a, b, c, d, per, phase, k in self._torsions:
            phi = _dihedral(xyz[a], xyz[b], xyz[c], xyz[d])
            e += k.value_in_unit(_KCAL) * (
                1.0 + np.cos(per * phi - phase.value_in_unit(_RAD)))
        return e


class NonbondedForce(Force):
    def __init__(self):
        super().__init__()
        self._particles: List[list] = []
        self._exceptions: List[list] = []

    def addParticle(self, charge, sigma, epsilon) -> int:
        self._particles.append([_q(charge, _E0), _q(sigma, _NM),
                                _q(epsilon, _KJ)])
        return len(self._particles) - 1

    def getNumParticles(self) -> int:
        return len(self._particles)

    def getParticleParameters(self, i: int):
        return tuple(self._particles[i])

    def setParticleParameters(self, i: int, charge, sigma, epsilon):
        self._particles[i] = [_q(charge, _E0), _q(sigma, _NM),
                              _q(epsilon, _KJ)]

    def addException(self, p1, p2, chargeProd, sigma, epsilon) -> int:
        self._exceptions.append([int(p1), int(p2),
                                 _q(chargeProd, _E0 ** 2), _q(sigma, _NM),
                                 _q(epsilon, _KJ)])
        return len(self._exceptions) - 1

    def getNumExceptions(self) -> int:
        return len(self._exceptions)

    def getExceptionParameters(self, i: int):
        return tuple(self._exceptions[i])

    def _energy(self, xyz):
        n = len(self._particles)
        q = np.array([p[0].value_in_unit(_E0) for p in self._particles])
        sig = np.array([p[1].value_in_unit(_ANG) for p in self._particles])
        eps = np.array([p[2].value_in_unit(_KCAL) for p in self._particles])
        excluded = {frozenset((e[0], e[1])) for e in self._exceptions}

        e = 0.0
        for i in range(n):
            for j in range(i + 1, n):
                if frozenset((i, j)) in excluded:
                    continue
                r = float(np.linalg.norm(xyz[i] - xyz[j]))
                e += COULOMB_CONSTANT * q[i] * q[j] / r
                s = 0.5 * (sig[i] + sig[j])          # Lorentz-Berthelot
                ep = np.sqrt(eps[i] * eps[j])
                sr6 = (s / r) ** 6
                e += 4.0 * ep * (sr6 ** 2 - sr6)
        for p1, p2, qq, s, ep in self._exceptions:
            qq = qq.value_in_unit(_E0 ** 2)
            s = s.value_in_unit(_ANG)
            ep = ep.value_in_unit(_KCAL)
            if qq == 0.0 and ep == 0.0:
                continue
            r = float(np.linalg.norm(xyz[p1] - xyz[p2]))
            sr6 = (s / r) ** 6 if s > 0 else 0.0
            e += COULOMB_CONSTANT * qq / r + 4.0 * ep * (sr6 ** 2 - sr6)
        return e


# ---------------------------------------------------------------------------
# system / context
class System:
    def __init__(self):
        self._masses: List[U.Quantity] = []
        self._forces: List[Force] = []

    def addParticle(self, mass) -> int:
        self._masses.append(_q(mass, U.dalton))
        return len(self._masses) - 1

    def getNumParticles(self) -> int:
        return len(self._masses)

    def getParticleMass(self, i: int):
        return self._masses[i]

    def addForce(self, force: Force) -> int:
        self._forces.append(force)
        return len(self._forces) - 1

    def getForces(self) -> List[Force]:
        return self._forces

    def getNumForces(self) -> int:
        return len(self._forces)

    def getForce(self, i: int) -> Force:
        return self._forces[i]

    def removeForce(self, i: int):
        del self._forces[i]


class VerletIntegrator:
    def __init__(self, step_size):
        self.step_size = _q(step_size, _PS)


class Platform:
    _instances: Dict[str, "Platform"] = {}

    def __init__(self, name: str):
        self.name = name

    @staticmethod
    def getPlatformByName(name: str) -> "Platform":
        return Platform._instances.setdefault(name, Platform(name))


class _State:
    def __init__(self, energy_kcal: Optional[float],
                 forces_kcal_ang: Optional[np.ndarray]):
        self._energy = energy_kcal
        self._forces = forces_kcal_ang

    def getPotentialEnergy(self) -> U.Quantity:
        return U.Quantity(self._energy, _KCAL)

    def getForces(self, asNumpy: bool = False):
        forces = self._forces if asNumpy else [f for f in self._forces]
        return U.Quantity(np.asarray(forces), _KCAL / _ANG)


class Context:
    def __init__(self, system: System, integrator=None, platform=None):
        self._system = system
        self._xyz: Optional[np.ndarray] = None

    def setPositions(self, positions):
        xyz = _q(positions, _NM).value_in_unit(_ANG)
        self._xyz = np.asarray(xyz, np.float64)

    def _total_energy(self, xyz: np.ndarray) -> float:
        return float(sum(f._energy(xyz) for f in self._system.getForces()))

    def getState(self, getEnergy: bool = False, getForces: bool = False,
                 **_ignored) -> _State:
        assert self._xyz is not None, "setPositions first"
        energy = self._total_energy(self._xyz) if getEnergy else None
        forces = None
        if getForces:
            n = self._xyz.shape[0]
            forces = np.zeros((n, 3))
            for i in range(n):
                for k in range(3):
                    xp = self._xyz.copy()
                    xm = self._xyz.copy()
                    xp[i, k] += _FD_EPS
                    xm[i, k] -= _FD_EPS
                    # force = -dE/dx
                    forces[i, k] = -(self._total_energy(xp)
                                     - self._total_energy(xm)) / (2 * _FD_EPS)
        return _State(energy, forces)


# ---------------------------------------------------------------------------
# app: topology
_SYMBOLS = [
    'X', 'H', 'He', 'Li', 'Be', 'B', 'C', 'N', 'O', 'F', 'Ne', 'Na', 'Mg',
    'Al', 'Si', 'P', 'S', 'Cl', 'Ar', 'K', 'Ca', 'Sc', 'Ti', 'V', 'Cr',
    'Mn', 'Fe', 'Co', 'Ni', 'Cu', 'Zn', 'Ga', 'Ge', 'As', 'Se', 'Br', 'Kr',
    'Rb', 'Sr', 'Y', 'Zr', 'Nb', 'Mo', 'Tc', 'Ru', 'Rh', 'Pd', 'Ag', 'Cd',
    'In', 'Sn', 'Sb', 'Te', 'I',
]


class Element:
    _by_number: Dict[int, "Element"] = {}

    def __init__(self, atomic_number: int, symbol: str):
        self.atomic_number = atomic_number
        self.symbol = symbol

    @classmethod
    def getByAtomicNumber(cls, z: int) -> "Element":
        if z not in cls._by_number:
            symbol = _SYMBOLS[z] if z < len(_SYMBOLS) else f'E{z}'
            cls._by_number[z] = Element(z, symbol)
        return cls._by_number[z]


class Chain:
    def __init__(self, id, topology: "Topology"):
        self.id = id
        self.topology = topology
        self._residues: List["Residue"] = []

    def residues(self):
        return iter(self._residues)


class Residue:
    def __init__(self, name: str, chain: Chain, id):
        self.name = name
        self.chain = chain
        self.id = id
        self._atoms: List["Atom"] = []

    def atoms(self):
        return iter(self._atoms)


class Atom:
    def __init__(self, name: str, element: Element, residue: Residue,
                 index: int, id):
        self.name = name
        self.element = element
        self.residue = residue
        self.index = index
        self.id = id


class Topology:
    def __init__(self):
        self._chains: List[Chain] = []
        self._atoms: List[Atom] = []
        self._bonds: List[tuple] = []

    def addChain(self, id=None) -> Chain:
        chain = Chain(id if id is not None else str(len(self._chains)), self)
        self._chains.append(chain)
        return chain

    def addResidue(self, name: str, chain: Chain, id=None) -> Residue:
        n_res = sum(len(c._residues) for c in self._chains)
        residue = Residue(name, chain, id if id is not None else str(n_res))
        chain._residues.append(residue)
        return residue

    def addAtom(self, name: str, element: Element, residue: Residue,
                id=None) -> Atom:
        index = len(self._atoms)
        atom = Atom(name, element, residue, index,
                    id if id is not None else str(index))
        self._atoms.append(atom)
        residue._atoms.append(atom)
        return atom

    def addBond(self, a: Atom, b: Atom):
        self._bonds.append((a, b))

    def atoms(self):
        return iter(self._atoms)

    def bonds(self):
        return iter(self._bonds)

    def chains(self):
        return iter(self._chains)

    def residues(self):
        for chain in self._chains:
            yield from chain._residues

    def getNumAtoms(self) -> int:
        return len(self._atoms)


# ---------------------------------------------------------------------------
# module assembly
def _module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


def build_modules():
    openmm = _module('openmm')
    for cls in (Force, CMMotionRemover, HarmonicBondForce,
                HarmonicAngleForce, PeriodicTorsionForce, NonbondedForce,
                System, VerletIntegrator, Platform, Context):
        setattr(openmm, cls.__name__, cls)

    unit = _module('openmm.unit')
    unit.Quantity = U.Quantity
    unit.Unit = U.Unit
    for name, u in (
            ('nanometer', U.nanometer), ('nanometers', U.nanometer),
            ('angstrom', U.angstrom), ('angstroms', U.angstrom),
            ('radian', U.radian), ('radians', U.radian),
            ('degree', U.degree), ('degrees', U.degree),
            ('picosecond', U.picosecond), ('picoseconds', U.picosecond),
            ('femtosecond', U.femtosecond), ('femtoseconds', U.femtosecond),
            ('dalton', U.dalton), ('daltons', U.dalton), ('amu', U.dalton),
            ('elementary_charge', U.elementary_charge),
            ('kilojoule_per_mole', U.kilojoule_per_mole),
            ('kilojoules_per_mole', U.kilojoule_per_mole),
            ('kilocalorie_per_mole', U.kilocalorie_per_mole),
            ('kilocalories_per_mole', U.kilocalorie_per_mole),
            ('mole', U.mole),
    ):
        setattr(unit, name, u)

    app = _module('openmm.app')
    for cls in (Topology, Chain, Residue, Atom, Element):
        setattr(app, cls.__name__, cls)

    openmm.unit = unit
    openmm.app = app
    return openmm, unit, app


def install():
    """Register the double as openmm/openmm.unit/openmm.app in sys.modules."""
    openmm, unit, app = build_modules()
    sys.modules['openmm'] = openmm
    sys.modules['openmm.unit'] = unit
    sys.modules['openmm.app'] = app
    return openmm


def uninstall():
    for name in ('openmm', 'openmm.unit', 'openmm.app'):
        sys.modules.pop(name, None)
