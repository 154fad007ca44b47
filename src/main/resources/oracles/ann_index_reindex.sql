SELECT CAST(cell AS INT) AS cell, CAST(cell_rows AS BIGINT) AS cell_rows
FROM (VALUES
(1,120),
(7,190),
(10,188),
(13,122)
) AS t(cell, cell_rows)
ORDER BY cell