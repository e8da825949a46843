from . import api, maps, oracle, planning
