from .tdis import Tdis, StressPeriod
