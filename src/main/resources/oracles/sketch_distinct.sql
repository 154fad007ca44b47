SELECT CAST(l_returnflag AS VARCHAR) AS l_returnflag, CAST(exact_orders AS BIGINT) AS exact_orders, CAST(hll_estimate AS DOUBLE) AS hll_estimate
FROM (VALUES
('A',11012,11198.496803606333),
('N',11062,11153.083271282192),
('R',11058,11063.777503233505)
) AS t(l_returnflag, exact_orders, hll_estimate)
ORDER BY l_returnflag