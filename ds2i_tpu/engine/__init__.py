from .device_index import DeviceIndex
from .executor import QueryEngine
from .flat_executor import FlatQueryEngine
from .resident import ResidentEngine
from .tile_executor import TileQueryEngine
