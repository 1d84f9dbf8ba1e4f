from .topology import Topology
from .dis import DisGrid
from .disv import DisvGrid
from .disu import DisuGrid
