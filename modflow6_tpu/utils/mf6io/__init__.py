from .reader import BlockFile, Block
from .loader import load_simulation
