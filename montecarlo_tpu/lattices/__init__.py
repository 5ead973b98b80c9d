from .lattice import Lattice, UnitCell
from .alps import ALPSLattice, ArbitraryLattice
from .library import (
    Chain, SquareLattice, CubicLattice, TriangularLattice, Honeycomb,
    GenericLattice, choose_lattice,
)
from .iterators import (
    EachSite, EachSiteAndFlavor, OnSite, EachSitePair, EachSitePairByDistance,
    EachLocalQuadByDistance, EachLocalQuadBySyncedDistance,
)
