from .engine import BatchedSumcheck, SumcheckInstance, OpeningAccumulator, SumcheckError
from .product import ProductSumcheck
