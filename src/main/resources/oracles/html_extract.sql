SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars_html AS BIGINT) AS n_chars_html, CAST(n_lines AS BIGINT) AS n_lines, CAST(head60 AS VARCHAR) AS head60, CAST(tail60 AS VARCHAR) AS tail60
FROM (VALUES
(0,234,8,'Doc 0
Home &raquo; Docs
Doc 0
key agg row scan slow fast tab','e line sort table window table table key
&copy; 2026 example'),
(1,483,8,'Doc 1
Home &raquo; Docs
Doc 1
batch window spark order data ','key agg query the group line table order
&copy; 2026 example'),
(2,323,8,'Doc 2
Home &raquo; Docs
Doc 2
small fast slow filter value s',' fast column scan data group spark value
&copy; 2026 example'),
(3,224,8,'Doc 3
Home &raquo; Docs
Doc 3
window merge spark merge batch',' stream customer group spark data vector
&copy; 2026 example'),
(4,327,8,'Doc 4
Home &raquo; Docs
Doc 4
data query small row slow row ','gg the column line the data row customer
&copy; 2026 example'),
(5,390,8,'Doc 5
Home &raquo; Docs
Doc 5
agg table spark hash sort key ','l stream order small key scan group line
&copy; 2026 example'),
(6,154,7,'Doc 6
Home &raquo; Docs
Doc 6
agg small scan table group sca','can group fast
alpha & beta
AB size <10>
&copy; 2026 example'),
(7,479,8,'Doc 7
Home &raquo; Docs
Doc 7
batch window vector hash fast ','ustomer scan order the customer key slow
&copy; 2026 example'),
(8,547,8,'Doc 8
Home &raquo; Docs
Doc 8
the spark join stream a small ','w window slow group group spark part dup
&copy; 2026 example'),
(9,468,8,'Doc 9
Home &raquo; Docs
Doc 9
order small line key filter co','ne merge hash join key group big a small
&copy; 2026 example'),
(10,293,8,'Doc 10
Home &raquo; Docs
Doc 10
order scan agg batch a small','y agg big query a spark the the join key
&copy; 2026 example'),
(11,383,8,'Doc 11
Home &raquo; Docs
Doc 11
the big data merge data spar','lter fast data key part line a merge key
&copy; 2026 example'),
(12,426,8,'Doc 12
Home &raquo; Docs
Doc 12
batch small fast slow a a or',' key join fast order slow customer value
&copy; 2026 example'),
(13,425,8,'Doc 13
Home &raquo; Docs
Doc 13
window query order value que','rk merge filter stream batch join vector
&copy; 2026 example'),
(14,573,8,'Doc 14
Home &raquo; Docs
Doc 14
stream small agg the group s','join part big filter query agg table key
&copy; 2026 example'),
(15,306,8,'Doc 15
Home &raquo; Docs
Doc 15
order merge small table grou','r join table join spark row line key big
&copy; 2026 example'),
(16,168,8,'Doc 16
Home &raquo; Docs
Doc 16
line vector order slow data ','can
alpha & beta
AB size <10>
table scan
&copy; 2026 example'),
(17,505,8,'Doc 17
Home &raquo; Docs
Doc 17
key a small data filter colu','all row column sort agg vector fast line
&copy; 2026 example'),
(18,501,8,'Doc 18
Home &raquo; Docs
Doc 18
merge small agg slow small v','er small customer order big window group
&copy; 2026 example'),
(19,135,7,'Doc 19
Home &raquo; Docs
Doc 19
vector scan row filter vecto','st group a agg
alpha & beta
AB size <10>
&copy; 2026 example'),
(20,472,8,'Doc 20
Home &raquo; Docs
Doc 20
window part slow customer jo','e vector row key the fast customer group
&copy; 2026 example'),
(21,296,8,'Doc 21
Home &raquo; Docs
Doc 21
key order join customer batc','r scan slow window hash order a customer
&copy; 2026 example'),
(22,533,8,'Doc 22
Home &raquo; Docs
Doc 22
slow sort small join column ',' stream line spark spark the small order
&copy; 2026 example'),
(23,244,8,'Doc 23
Home &raquo; Docs
Doc 23
filter slow the data custome','e part data the filter window scan batch
&copy; 2026 example'),
(24,614,8,'Doc 24
Home &raquo; Docs
Doc 24
sort a spark table stream so','part join key big column vector a vector
&copy; 2026 example'),
(25,584,8,'Doc 25
Home &raquo; Docs
Doc 25
merge fast query fast column','an the batch window small fast key group
&copy; 2026 example'),
(26,141,7,'Doc 26
Home &raquo; Docs
Doc 26
table small sort order small',' key group dup
alpha & beta
AB size <10>
&copy; 2026 example'),
(27,424,8,'Doc 27
Home &raquo; Docs
Doc 27
key small customer spark mer','e column order agg value a hash column a
&copy; 2026 example'),
(28,412,8,'Doc 28
Home &raquo; Docs
Doc 28
query hash key line spark ag',' sort stream fast slow hash batch stream
&copy; 2026 example'),
(29,275,8,'Doc 29
Home &raquo; Docs
Doc 29
table small window vector a ',' query scan data batch customer customer
&copy; 2026 example'),
(30,245,8,'Doc 30
Home &raquo; Docs
Doc 30
key row sort small key a bat','all fast vector the the window sort join
&copy; 2026 example'),
(31,329,8,'Doc 31
Home &raquo; Docs
Doc 31
the a column batch customer ','omer small row part big line filter hash
&copy; 2026 example'),
(32,592,8,'Doc 32
Home &raquo; Docs
Doc 32
table join row merge window ','omer vector stream column spark customer
&copy; 2026 example'),
(33,325,8,'Doc 33
Home &raquo; Docs
Doc 33
line column merge fast hash ','ry a row sort sort slow line stream part
&copy; 2026 example'),
(34,244,8,'Doc 34
Home &raquo; Docs
Doc 34
sort table merge row order s','er query stream slow spark order agg big
&copy; 2026 example'),
(35,531,8,'Doc 35
Home &raquo; Docs
Doc 35
filter join join big agg key','mer line table customer row slow key key
&copy; 2026 example'),
(36,214,8,'Doc 36
Home &raquo; Docs
Doc 36
stream value data value line',' group batch stream slow window customer
&copy; 2026 example'),
(37,456,8,'Doc 37
Home &raquo; Docs
Doc 37
data scan a stream small sca','mer agg order slow group slow agg column
&copy; 2026 example'),
(38,282,8,'Doc 38
Home &raquo; Docs
Doc 38
merge group small line windo','in line line small spark customer a scan
&copy; 2026 example'),
(39,203,8,'Doc 39
Home &raquo; Docs
Doc 39
small window sort row column','ark small vector filter query join batch
&copy; 2026 example'),
(40,500,8,'Doc 40
Home &raquo; Docs
Doc 40
order scan line hash line wi','h slow big group group vector order hash
&copy; 2026 example'),
(41,415,8,'Doc 41
Home &raquo; Docs
Doc 41
line group batch key merge j',' value batch value key agg line sort key
&copy; 2026 example'),
(42,382,8,'Doc 42
Home &raquo; Docs
Doc 42
group column key window join','ndow line customer sort batch row stream
&copy; 2026 example'),
(43,231,8,'Doc 43
Home &raquo; Docs
Doc 43
stream group small the filte','ow group agg batch stream fast row query
&copy; 2026 example'),
(44,207,8,'Doc 44
Home &raquo; Docs
Doc 44
data data sort agg scan valu','e row line row stream value order filter
&copy; 2026 example'),
(45,510,8,'Doc 45
Home &raquo; Docs
Doc 45
merge group part scan row va','e join row slow hash batch small dup dup
&copy; 2026 example'),
(46,570,8,'Doc 46
Home &raquo; Docs
Doc 46
scan stream agg small custom','r join scan small merge batch row vector
&copy; 2026 example'),
(47,302,8,'Doc 47
Home &raquo; Docs
Doc 47
a column merge small value m','y fast stream scan scan order data batch
&copy; 2026 example'),
(48,243,8,'Doc 48
Home &raquo; Docs
Doc 48
customer fast big line big s','group customer sort row filter sort part
&copy; 2026 example'),
(49,334,8,'Doc 49
Home &raquo; Docs
Doc 49
query batch data batch slow ','r part small the spark hash table vector
&copy; 2026 example'),
(50,334,8,'Doc 50
Home &raquo; Docs
Doc 50
slow value window column dat','spark hash group filter filter agg spark
&copy; 2026 example'),
(51,405,8,'Doc 51
Home &raquo; Docs
Doc 51
order spark filter hash quer',' customer vector join sort data key hash
&copy; 2026 example'),
(52,141,7,'Doc 52
Home &raquo; Docs
Doc 52
part join window part agg sm',' a the big agg
alpha & beta
AB size <10>
&copy; 2026 example'),
(53,269,8,'Doc 53
Home &raquo; Docs
Doc 53
group slow table scan data p','gg stream filter sort query value filter
&copy; 2026 example'),
(54,436,8,'Doc 54
Home &raquo; Docs
Doc 54
batch a table small column t','spark big stream window query hash order
&copy; 2026 example'),
(55,275,8,'Doc 55
Home &raquo; Docs
Doc 55
stream slow customer a row h','ble data value line fast sort batch hash
&copy; 2026 example'),
(56,627,8,'Doc 56
Home &raquo; Docs
Doc 56
merge key part vector data o','atch stream window join the filter spark
&copy; 2026 example'),
(57,526,8,'Doc 57
Home &raquo; Docs
Doc 57
hash the batch big scan a li','ctor order small slow order filter group
&copy; 2026 example'),
(58,467,8,'Doc 58
Home &raquo; Docs
Doc 58
column stream spark hash gro','ter order fast group group big group dup
&copy; 2026 example'),
(59,196,8,'Doc 59
Home &raquo; Docs
Doc 59
join hash group join group b','>
small fast a fast line a agg slow join
&copy; 2026 example'),
(60,572,8,'Doc 60
Home &raquo; Docs
Doc 60
key sort data scan big agg c','ector a scan agg part row filter the the
&copy; 2026 example'),
(61,388,8,'Doc 61
Home &raquo; Docs
Doc 61
merge small small the order ','tch agg table column agg value batch dup
&copy; 2026 example'),
(62,470,8,'Doc 62
Home &raquo; Docs
Doc 62
group a order value fast cus','ey table part merge group join scan scan
&copy; 2026 example'),
(63,607,8,'Doc 63
Home &raquo; Docs
Doc 63
scan small data slow scan qu','the slow big table stream part the group
&copy; 2026 example'),
(64,213,8,'Doc 64
Home &raquo; Docs
Doc 64
join agg join a table hash b','r query customer query scan filter value
&copy; 2026 example'),
(65,177,8,'Doc 65
Home &raquo; Docs
Doc 65
the filter line row merge ta','a & beta
AB size <10>
query the agg hash
&copy; 2026 example'),
(66,431,8,'Doc 66
Home &raquo; Docs
Doc 66
a row customer column custom','data the hash batch window hash customer
&copy; 2026 example'),
(67,411,8,'Doc 67
Home &raquo; Docs
Doc 67
key stream agg row vector da','rge hash vector big sort the scan column
&copy; 2026 example'),
(68,264,8,'Doc 68
Home &raquo; Docs
Doc 68
key hash slow join value sca',' fast customer column key part key order
&copy; 2026 example'),
(69,387,8,'Doc 69
Home &raquo; Docs
Doc 69
column agg stream window ord','er query join fast slow order query sort
&copy; 2026 example'),
(70,588,8,'Doc 70
Home &raquo; Docs
Doc 70
the column customer data str',' line row order join value key table dup
&copy; 2026 example'),
(71,414,8,'Doc 71
Home &raquo; Docs
Doc 71
filter vector agg vector fil','w a key value join filter group sort row
&copy; 2026 example'),
(72,309,8,'Doc 72
Home &raquo; Docs
Doc 72
hash sort filter customer jo','rder big part join hash stream part sort
&copy; 2026 example'),
(73,582,8,'Doc 73
Home &raquo; Docs
Doc 73
join part data agg part line',' value scan part customer scan slow join
&copy; 2026 example'),
(74,126,7,'Doc 74
Home &raquo; Docs
Doc 74
data batch data key data col','g key key slow
alpha & beta
AB size <10>
&copy; 2026 example'),
(75,390,8,'Doc 75
Home &raquo; Docs
Doc 75
customer row a big scan smal',' row column customer customer key vector
&copy; 2026 example'),
(76,461,8,'Doc 76
Home &raquo; Docs
Doc 76
table big column join key th','lue merge batch sort vector agg row part
&copy; 2026 example'),
(77,397,8,'Doc 77
Home &raquo; Docs
Doc 77
a table window key batch slo','batch query filter group join part query
&copy; 2026 example'),
(78,311,8,'Doc 78
Home &raquo; Docs
Doc 78
data sort column stream big ','merge fast vector row batch a filter key
&copy; 2026 example'),
(79,141,7,'Doc 79
Home &raquo; Docs
Doc 79
sort filter the spark query ',' a small order
alpha & beta
AB size <10>
&copy; 2026 example'),
(80,251,8,'Doc 80
Home &raquo; Docs
Doc 80
part a vector hash big join ','scan data join merge join filter big the
&copy; 2026 example'),
(81,436,8,'Doc 81
Home &raquo; Docs
Doc 81
batch column big order colum','ata vector big data merge key join group
&copy; 2026 example'),
(82,338,8,'Doc 82
Home &raquo; Docs
Doc 82
table batch merge small a ke','rder row scan group hash data batch sort
&copy; 2026 example'),
(83,167,8,'Doc 83
Home &raquo; Docs
Doc 83
value table hash query query','mer p
alpha & beta
AB size <10>
art slow
&copy; 2026 example'),
(84,482,8,'Doc 84
Home &raquo; Docs
Doc 84
hash part order hash scan gr','indow fast sort small batch window batch
&copy; 2026 example'),
(85,233,8,'Doc 85
Home &raquo; Docs
Doc 85
row big table table part cus','ble hash batch table small row agg big a
&copy; 2026 example'),
(86,216,8,'Doc 86
Home &raquo; Docs
Doc 86
value join merge window valu','oup customer data value window slow line
&copy; 2026 example'),
(87,207,8,'Doc 87
Home &raquo; Docs
Doc 87
query filter vector spark sc','filter row key part group a batch column
&copy; 2026 example'),
(88,368,8,'Doc 88
Home &raquo; Docs
Doc 88
customer table group stream ','customer value stream small sort a batch
&copy; 2026 example'),
(89,220,8,'Doc 89
Home &raquo; Docs
Doc 89
hash spark stream part table','e hash sort data spark value value row a
&copy; 2026 example'),
(90,190,8,'Doc 90
Home &raquo; Docs
Doc 90
row data hash agg order the ','ze <10>
a batch big column key row agg a
&copy; 2026 example'),
(91,509,8,'Doc 91
Home &raquo; Docs
Doc 91
batch small table spark quer','l merge merge table stream window a hash
&copy; 2026 example'),
(92,224,8,'Doc 92
Home &raquo; Docs
Doc 92
the spark query slow small t','tor hash order data query join order dup
&copy; 2026 example'),
(93,208,8,'Doc 93
Home &raquo; Docs
Doc 93
vector column column vector ','rt fast merge column line line row key a
&copy; 2026 example'),
(94,221,8,'Doc 94
Home &raquo; Docs
Doc 94
slow slow query scan custome','mer query order table a batch group slow
&copy; 2026 example'),
(95,375,8,'Doc 95
Home &raquo; Docs
Doc 95
part part small row merge me','w query fast a vector query key hash big
&copy; 2026 example'),
(96,533,8,'Doc 96
Home &raquo; Docs
Doc 96
column line sort key window ',' query agg agg a join hash slow customer
&copy; 2026 example'),
(97,399,8,'Doc 97
Home &raquo; Docs
Doc 97
scan key spark line a small ',' vector small query key merge join batch
&copy; 2026 example'),
(98,605,8,'Doc 98
Home &raquo; Docs
Doc 98
spark scan spark table hash ','able small group scan vector spark batch
&copy; 2026 example'),
(99,275,8,'Doc 99
Home &raquo; Docs
Doc 99
column key hash value agg so','ow hash the small stream batch fast data
&copy; 2026 example'),
(100,541,8,'Doc 100
Home &raquo; Docs
Doc 100
batch data join scan table','ctor part sort stream small window query
&copy; 2026 example'),
(101,312,8,'Doc 101
Home &raquo; Docs
Doc 101
table join fast slow query','ig big scan row group table customer big
&copy; 2026 example'),
(102,596,8,'Doc 102
Home &raquo; Docs
Doc 102
customer vector key the fi','lumn scan filter customer data the group
&copy; 2026 example'),
(103,608,8,'Doc 103
Home &raquo; Docs
Doc 103
customer query big batch s','ig vector group merge order group stream
&copy; 2026 example'),
(104,327,8,'Doc 104
Home &raquo; Docs
Doc 104
row sort value the hash da',' spark line small vector batch data data
&copy; 2026 example'),
(105,409,8,'Doc 105
Home &raquo; Docs
Doc 105
the fast column batch valu',' big order the batch sort agg value sort
&copy; 2026 example'),
(106,150,7,'Doc 106
Home &raquo; Docs
Doc 106
small join fast vector joi','ter slow small
alpha & beta
AB size <10>
&copy; 2026 example'),
(107,293,8,'Doc 107
Home &raquo; Docs
Doc 107
hash query group row line ','an vector query filter spark key big dup
&copy; 2026 example'),
(108,166,8,'Doc 108
Home &raquo; Docs
Doc 108
table batch fast table key','a small
alpha & beta
AB size <10>
stream
&copy; 2026 example'),
(109,476,8,'Doc 109
Home &raquo; Docs
Doc 109
part spark line order fast','column line line order filter fast spark
&copy; 2026 example'),
(110,134,7,'Doc 110
Home &raquo; Docs
Doc 110
scan merge part agg table ','slow row small
alpha & beta
AB size <10>
&copy; 2026 example'),
(111,610,8,'Doc 111
Home &raquo; Docs
Doc 111
merge merge part agg merge',' spark row query filter query value sort
&copy; 2026 example'),
(112,403,8,'Doc 112
Home &raquo; Docs
Doc 112
vector order the scan the ','ll table table join sort batch scan fast
&copy; 2026 example'),
(113,508,8,'Doc 113
Home &raquo; Docs
Doc 113
scan hash filter line agg ','customer hash scan vector merge customer
&copy; 2026 example'),
(114,287,8,'Doc 114
Home &raquo; Docs
Doc 114
customer row stream slow c','w line small small key batch value table
&copy; 2026 example'),
(115,213,8,'Doc 115
Home &raquo; Docs
Doc 115
row part key vector table ',' merge key part column order group batch
&copy; 2026 example'),
(116,142,7,'Doc 116
Home &raquo; Docs
Doc 116
small window part customer','ch query query
alpha & beta
AB size <10>
&copy; 2026 example'),
(117,327,8,'Doc 117
Home &raquo; Docs
Doc 117
scan group query query a q','lue group part scan scan data batch hash
&copy; 2026 example'),
(118,477,8,'Doc 118
Home &raquo; Docs
Doc 118
table stream batch data cu','roup fast batch merge spark small stream
&copy; 2026 example'),
(119,167,8,'Doc 119
Home &raquo; Docs
Doc 119
column filter agg row agg ','stomer
alpha & beta
AB size <10>
agg the
&copy; 2026 example'),
(120,292,8,'Doc 120
Home &raquo; Docs
Doc 120
spark column vector stream','m batch scan column spark group hash dup
&copy; 2026 example'),
(121,248,8,'Doc 121
Home &raquo; Docs
Doc 121
spark big batch column ord',' hash window merge customer row agg slow
&copy; 2026 example'),
(122,183,8,'Doc 122
Home &raquo; Docs
Doc 122
customer key customer spar','beta
AB size <10>
ne fast spark sort agg
&copy; 2026 example'),
(123,238,8,'Doc 123
Home &raquo; Docs
Doc 123
the stream order customer ','ata row agg sort window group the column
&copy; 2026 example'),
(124,392,8,'Doc 124
Home &raquo; Docs
Doc 124
slow agg stream column sor','ey data the data slow agg line key small
&copy; 2026 example'),
(125,265,8,'Doc 125
Home &raquo; Docs
Doc 125
fast the join part table o','rk line window query a vector slow table
&copy; 2026 example'),
(126,590,8,'Doc 126
Home &raquo; Docs
Doc 126
key hash line the merge cu','ustomer vector hash line key small order
&copy; 2026 example'),
(127,515,8,'Doc 127
Home &raquo; Docs
Doc 127
part small fast table vect','or query scan table big join sort a line
&copy; 2026 example'),
(128,535,8,'Doc 128
Home &raquo; Docs
Doc 128
value filter hash scan dat',' merge a agg line filter merge value the
&copy; 2026 example'),
(129,520,8,'Doc 129
Home &raquo; Docs
Doc 129
filter join the merge spar','e small table merge line customer vector
&copy; 2026 example'),
(130,231,8,'Doc 130
Home &raquo; Docs
Doc 130
spark table batch window v','olumn the slow part agg join stream part
&copy; 2026 example'),
(131,374,8,'Doc 131
Home &raquo; Docs
Doc 131
row merge join slow column',' filter stream row vector big slow small
&copy; 2026 example'),
(132,410,8,'Doc 132
Home &raquo; Docs
Doc 132
join row small a big a str','the vector scan small column stream hash
&copy; 2026 example'),
(133,580,8,'Doc 133
Home &raquo; Docs
Doc 133
row customer column table ','st batch the sort stream value sort slow
&copy; 2026 example'),
(134,213,8,'Doc 134
Home &raquo; Docs
Doc 134
query filter vector spark ','er row key part group a batch column dup
&copy; 2026 example'),
(135,619,8,'Doc 135
Home &raquo; Docs
Doc 135
merge fast part customer s','rk small key spark small the query order
&copy; 2026 example'),
(136,415,8,'Doc 136
Home &raquo; Docs
Doc 136
a hash big join line row j','ter join sort hash small hash slow query
&copy; 2026 example'),
(137,313,8,'Doc 137
Home &raquo; Docs
Doc 137
line a query stream table ',' filter the row slow query filter column
&copy; 2026 example'),
(138,445,8,'Doc 138
Home &raquo; Docs
Doc 138
data filter key filter row','tor customer window key sort slow stream
&copy; 2026 example'),
(139,375,8,'Doc 139
Home &raquo; Docs
Doc 139
stream customer small smal','value data a sort window agg scan stream
&copy; 2026 example'),
(140,238,8,'Doc 140
Home &raquo; Docs
Doc 140
group agg big query filter','can stream group vector merge vector big
&copy; 2026 example'),
(141,512,8,'Doc 141
Home &raquo; Docs
Doc 141
scan a hash key value cust','ow data key join scan small value window
&copy; 2026 example'),
(142,592,8,'Doc 142
Home &raquo; Docs
Doc 142
the small query line custo','y slow group join vector batch hash hash
&copy; 2026 example'),
(143,492,8,'Doc 143
Home &raquo; Docs
Doc 143
a part filter scan slow sp',' row query filter filter order part scan
&copy; 2026 example'),
(144,169,8,'Doc 144
Home &raquo; Docs
Doc 144
column row row the key agg',' part
alpha & beta
AB size <10>
scan key
&copy; 2026 example'),
(145,481,8,'Doc 145
Home &raquo; Docs
Doc 145
slow batch hash filter spa','able data agg spark sort group the spark
&copy; 2026 example'),
(146,210,8,'Doc 146
Home &raquo; Docs
Doc 146
vector spark the merge val','ne window vector scan stream hash column
&copy; 2026 example'),
(147,522,8,'Doc 147
Home &raquo; Docs
Doc 147
group batch key small valu',' agg value batch filter spark scan value
&copy; 2026 example'),
(148,278,8,'Doc 148
Home &raquo; Docs
Doc 148
value spark stream merge s','olumn slow hash stream slow slow the agg
&copy; 2026 example'),
(149,237,8,'Doc 149
Home &raquo; Docs
Doc 149
the row query batch query ','tomer batch value batch order small slow
&copy; 2026 example'),
(150,354,8,'Doc 150
Home &raquo; Docs
Doc 150
sort join join vector quer','big group vector filter order spark part
&copy; 2026 example'),
(151,599,8,'Doc 151
Home &raquo; Docs
Doc 151
stream sort sort sort valu','ey data window filter big query customer
&copy; 2026 example'),
(152,298,8,'Doc 152
Home &raquo; Docs
Doc 152
fast merge row data slow b',' big scan batch scan a vector vector dup
&copy; 2026 example'),
(153,513,8,'Doc 153
Home &raquo; Docs
Doc 153
column the the slow vector','park spark fast sort sort line data fast
&copy; 2026 example'),
(154,523,8,'Doc 154
Home &raquo; Docs
Doc 154
sort order value a column ','he window filter sort filter join sort a
&copy; 2026 example'),
(155,448,8,'Doc 155
Home &raquo; Docs
Doc 155
window join merge agg valu','ch customer query a customer vector fast
&copy; 2026 example'),
(156,203,8,'Doc 156
Home &raquo; Docs
Doc 156
hash sort small slow big g','mer scan order stream window sort vector
&copy; 2026 example'),
(157,171,8,'Doc 157
Home &raquo; Docs
Doc 157
slow hash batch line strea','can
alpha & beta
AB size <10>
customer a
&copy; 2026 example'),
(158,187,8,'Doc 158
Home &raquo; Docs
Doc 158
hash customer table filter','
AB size <10>
p batch hash customer fast
&copy; 2026 example'),
(159,459,8,'Doc 159
Home &raquo; Docs
Doc 159
data table merge agg fast ','uery spark big big row join vector spark
&copy; 2026 example'),
(160,326,8,'Doc 160
Home &raquo; Docs
Doc 160
batch filter the order ord',' hash stream hash window customer a data
&copy; 2026 example'),
(161,554,8,'Doc 161
Home &raquo; Docs
Doc 161
fast join key customer the',' merge hash filter part scan merge spark
&copy; 2026 example'),
(162,539,8,'Doc 162
Home &raquo; Docs
Doc 162
customer window order filt','part batch small scan window value small
&copy; 2026 example'),
(163,338,8,'Doc 163
Home &raquo; Docs
Doc 163
row window value batch sca','am filter key order customer query group
&copy; 2026 example'),
(164,189,8,'Doc 164
Home &raquo; Docs
Doc 164
key table query part windo','B size <10>
mer a sort batch group query
&copy; 2026 example'),
(165,188,8,'Doc 165
Home &raquo; Docs
Doc 165
slow value spark hash join','B size <10>
key fast hash group customer
&copy; 2026 example'),
(166,408,8,'Doc 166
Home &raquo; Docs
Doc 166
query column group agg fil','join fast customer join vector fast sort
&copy; 2026 example'),
(167,556,8,'Doc 167
Home &raquo; Docs
Doc 167
key vector stream group sp',' part slow data filter a scan table line
&copy; 2026 example'),
(168,308,8,'Doc 168
Home &raquo; Docs
Doc 168
small query slow customer ','mer vector value slow sort order value a
&copy; 2026 example'),
(169,479,8,'Doc 169
Home &raquo; Docs
Doc 169
window join value line cus','in vector filter hash part agg key value
&copy; 2026 example'),
(170,205,8,'Doc 170
Home &raquo; Docs
Doc 170
group column batch big cus','e slow part table query fast window hash
&copy; 2026 example'),
(171,409,8,'Doc 171
Home &raquo; Docs
Doc 171
query big vector slow tabl','can vector small column table sort table
&copy; 2026 example'),
(172,184,8,'Doc 172
Home &raquo; Docs
Doc 172
sort scan vector stream pa','eta
AB size <10>
uery table join a query
&copy; 2026 example'),
(173,621,8,'Doc 173
Home &raquo; Docs
Doc 173
group row vector table dat','data agg part window slow sort spark the
&copy; 2026 example'),
(174,396,8,'Doc 174
Home &raquo; Docs
Doc 174
slow row query table agg h','ustomer value row merge filter scan data
&copy; 2026 example'),
(175,239,8,'Doc 175
Home &raquo; Docs
Doc 175
group group order fast val',' row customer merge hash table value big
&copy; 2026 example'),
(176,572,8,'Doc 176
Home &raquo; Docs
Doc 176
hash agg a hash big data r',' filter filter scan hash batch hash hash
&copy; 2026 example'),
(177,343,8,'Doc 177
Home &raquo; Docs
Doc 177
the key query window agg s',' merge slow agg order filter small value
&copy; 2026 example'),
(178,294,8,'Doc 178
Home &raquo; Docs
Doc 178
fast merge row data slow b',' the big scan batch scan a vector vector
&copy; 2026 example'),
(179,564,8,'Doc 179
Home &raquo; Docs
Doc 179
key small big data query p','eam vector vector small fast table group
&copy; 2026 example'),
(180,266,8,'Doc 180
Home &raquo; Docs
Doc 180
agg query part merge filte','dow batch group big line small the order
&copy; 2026 example'),
(181,189,8,'Doc 181
Home &raquo; Docs
Doc 181
filter part customer the c','B size <10>
order query filter sort part
&copy; 2026 example'),
(182,423,8,'Doc 182
Home &raquo; Docs
Doc 182
agg key order row vector b','lter join agg hash data order group line
&copy; 2026 example'),
(183,179,8,'Doc 183
Home &raquo; Docs
Doc 183
window order join line bat','a & beta
AB size <10>
small row agg part
&copy; 2026 example'),
(184,521,8,'Doc 184
Home &raquo; Docs
Doc 184
part a value query key tab','ector join big key hash value scan spark
&copy; 2026 example'),
(185,386,8,'Doc 185
Home &raquo; Docs
Doc 185
merge small small the orde','y batch agg table column agg value batch
&copy; 2026 example'),
(186,494,8,'Doc 186
Home &raquo; Docs
Doc 186
row table query scan vecto','low query agg stream row sort data group
&copy; 2026 example'),
(187,578,8,'Doc 187
Home &raquo; Docs
Doc 187
a group scan hash big filt','up filter line merge hash data key batch
&copy; 2026 example'),
(188,327,8,'Doc 188
Home &raquo; Docs
Doc 188
merge stream a window batc','n agg window spark fast line spark group
&copy; 2026 example'),
(189,287,8,'Doc 189
Home &raquo; Docs
Doc 189
group window line slow val','r table merge a column spark table value
&copy; 2026 example'),
(190,508,8,'Doc 190
Home &raquo; Docs
Doc 190
table spark fast a hash va','alue merge order sort spark window small
&copy; 2026 example'),
(191,198,8,'Doc 191
Home &raquo; Docs
Doc 191
customer merge scan batch ','0>
hash order fast agg table scan column
&copy; 2026 example'),
(192,212,8,'Doc 192
Home &raquo; Docs
Doc 192
filter column table part r',' part merge group order row a slow group
&copy; 2026 example'),
(193,248,8,'Doc 193
Home &raquo; Docs
Doc 193
line join batch query key ','data group row merge the value data part
&copy; 2026 example'),
(194,236,8,'Doc 194
Home &raquo; Docs
Doc 194
the scan big row query col',' line window stream spark sort join join
&copy; 2026 example'),
(195,398,8,'Doc 195
Home &raquo; Docs
Doc 195
small scan small merge cus','spark table key big group data table row
&copy; 2026 example'),
(196,420,8,'Doc 196
Home &raquo; Docs
Doc 196
filter big column slow agg','mer big merge filter join row order data
&copy; 2026 example'),
(197,603,8,'Doc 197
Home &raquo; Docs
Doc 197
a query merge column the c','tch big line table hash row merge stream
&copy; 2026 example'),
(198,334,8,'Doc 198
Home &raquo; Docs
Doc 198
slow hash join agg stream ',' merge filter agg batch part table merge
&copy; 2026 example'),
(199,234,8,'Doc 199
Home &raquo; Docs
Doc 199
column query agg slow sort','rk hash table column key hash vector the
&copy; 2026 example'),
(200,383,8,'Doc 200
Home &raquo; Docs
Doc 200
part hash agg value big sl','omer row merge big a column small window
&copy; 2026 example'),
(201,396,8,'Doc 201
Home &raquo; Docs
Doc 201
line merge batch value gro','agg table line join key small hash group
&copy; 2026 example'),
(202,561,8,'Doc 202
Home &raquo; Docs
Doc 202
join key window hash query','ndow slow spark window stream join order
&copy; 2026 example'),
(203,209,8,'Doc 203
Home &raquo; Docs
Doc 203
column table line batch sl','or window slow data hash batch query row
&copy; 2026 example'),
(204,198,8,'Doc 204
Home &raquo; Docs
Doc 204
vector group group join ta','0>
ine window sort fast merge fast small
&copy; 2026 example'),
(205,457,8,'Doc 205
Home &raquo; Docs
Doc 205
join hash agg batch the bi',' window a merge sort fast query customer
&copy; 2026 example'),
(206,211,8,'Doc 206
Home &raquo; Docs
Doc 206
key the slow small join me',' the big row table slow filter big merge
&copy; 2026 example'),
(207,465,8,'Doc 207
Home &raquo; Docs
Doc 207
merge big join batch scan ','an part hash fast stream table line line
&copy; 2026 example'),
(208,195,8,'Doc 208
Home &raquo; Docs
Doc 208
hash order the line key da',' <10>
hash scan order value order window
&copy; 2026 example'),
(209,304,8,'Doc 209
Home &raquo; Docs
Doc 209
big spark fast sort group ','slow query key slow key spark group sort
&copy; 2026 example'),
(210,596,8,'Doc 210
Home &raquo; Docs
Doc 210
customer batch window colu','column hash spark key window table small
&copy; 2026 example'),
(211,360,8,'Doc 211
Home &raquo; Docs
Doc 211
column key line sort spark','lue table row batch stream row group row
&copy; 2026 example'),
(212,334,8,'Doc 212
Home &raquo; Docs
Doc 212
vector small hash group cu',' big a order value customer stream order
&copy; 2026 example'),
(213,548,8,'Doc 213
Home &raquo; Docs
Doc 213
fast part scan line column',' window big customer merge hash row line
&copy; 2026 example'),
(214,149,7,'Doc 214
Home &raquo; Docs
Doc 214
data query part the custom','hash hash part
alpha & beta
AB size <10>
&copy; 2026 example'),
(215,608,8,'Doc 215
Home &raquo; Docs
Doc 215
slow the batch batch a cus','ble the value filter row small the merge
&copy; 2026 example'),
(216,609,8,'Doc 216
Home &raquo; Docs
Doc 216
column group spark sort va','er scan query customer filter fast group
&copy; 2026 example'),
(217,430,8,'Doc 217
Home &raquo; Docs
Doc 217
table part key sort column','all spark order a a sort customer window
&copy; 2026 example'),
(218,535,8,'Doc 218
Home &raquo; Docs
Doc 218
data line table small valu','roup data column vector table vector big
&copy; 2026 example'),
(219,256,8,'Doc 219
Home &raquo; Docs
Doc 219
scan order customer big ve',' fast merge table stream scan agg stream
&copy; 2026 example'),
(220,633,8,'Doc 220
Home &raquo; Docs
Doc 220
part sort group column dat','er key value table stream slow key table
&copy; 2026 example'),
(221,301,8,'Doc 221
Home &raquo; Docs
Doc 221
join order value key vecto','ector line a slow big the row batch data
&copy; 2026 example'),
(222,342,8,'Doc 222
Home &raquo; Docs
Doc 222
vector spark window scan l','ch a query data line the the fast scan a
&copy; 2026 example'),
(223,540,8,'Doc 223
Home &raquo; Docs
Doc 223
table vector group the agg','l hash agg part stream data vector value
&copy; 2026 example'),
(224,523,8,'Doc 224
Home &raquo; Docs
Doc 224
scan part batch customer g','alue customer row value value row stream
&copy; 2026 example'),
(225,499,8,'Doc 225
Home &raquo; Docs
Doc 225
small join agg big value s','r column part batch row value batch data
&copy; 2026 example'),
(226,189,8,'Doc 226
Home &raquo; Docs
Doc 226
part vector small the spar','B size <10>
small part group query table
&copy; 2026 example'),
(227,548,8,'Doc 227
Home &raquo; Docs
Doc 227
join part table filter agg',' column key vector value customer filter
&copy; 2026 example'),
(228,544,8,'Doc 228
Home &raquo; Docs
Doc 228
hash fast window vector ro','a join data customer join window a merge
&copy; 2026 example'),
(229,490,8,'Doc 229
Home &raquo; Docs
Doc 229
the order join group join ','the value query group hash hash sort row
&copy; 2026 example'),
(230,392,8,'Doc 230
Home &raquo; Docs
Doc 230
the query value vector spa','umn part slow vector small filter column
&copy; 2026 example'),
(231,236,8,'Doc 231
Home &raquo; Docs
Doc 231
a part window slow spark t',' batch hash customer filter big column a
&copy; 2026 example'),
(232,397,8,'Doc 232
Home &raquo; Docs
Doc 232
key column a hash join big','join big small batch fast key scan batch
&copy; 2026 example'),
(233,538,8,'Doc 233
Home &raquo; Docs
Doc 233
join data data query join ','e stream part vector batch the big value
&copy; 2026 example'),
(234,425,8,'Doc 234
Home &raquo; Docs
Doc 234
a key batch query merge me','g sort window scan batch value spark agg
&copy; 2026 example'),
(235,305,8,'Doc 235
Home &raquo; Docs
Doc 235
key fast customer batch wi','park join spark filter small spark spark
&copy; 2026 example'),
(236,142,7,'Doc 236
Home &raquo; Docs
Doc 236
table column agg join grou',' hash line dup
alpha & beta
AB size <10>
&copy; 2026 example'),
(237,497,8,'Doc 237
Home &raquo; Docs
Doc 237
part the table batch line ','ry vector query a value join spark group
&copy; 2026 example'),
(238,338,8,'Doc 238
Home &raquo; Docs
Doc 238
query query part slow orde',' slow spark window merge big join filter
&copy; 2026 example'),
(239,245,8,'Doc 239
Home &raquo; Docs
Doc 239
fast part batch filter row','group scan data a hash small window sort
&copy; 2026 example'),
(240,460,8,'Doc 240
Home &raquo; Docs
Doc 240
the fast fast fast stream ','t window group vector the data key table
&copy; 2026 example'),
(241,591,8,'Doc 241
Home &raquo; Docs
Doc 241
a key column value spark s',' value spark batch vector slow order the
&copy; 2026 example'),
(242,469,8,'Doc 242
Home &raquo; Docs
Doc 242
join sort vector filter me','ne batch customer big scan customer line
&copy; 2026 example'),
(243,259,8,'Doc 243
Home &raquo; Docs
Doc 243
hash merge batch a window ','uery small query sort fast row line part
&copy; 2026 example'),
(244,451,8,'Doc 244
Home &raquo; Docs
Doc 244
query order part vector va','park part row slow join batch query scan
&copy; 2026 example'),
(245,547,8,'Doc 245
Home &raquo; Docs
Doc 245
the spark join stream a sm','t row window slow group group spark part
&copy; 2026 example'),
(246,256,8,'Doc 246
Home &raquo; Docs
Doc 246
agg column part slow scan ',' big line scan customer batch filter the
&copy; 2026 example'),
(247,511,8,'Doc 247
Home &raquo; Docs
Doc 247
slow order stream a the fa','y stream hash join scan slow table batch
&copy; 2026 example'),
(248,527,8,'Doc 248
Home &raquo; Docs
Doc 248
customer batch query agg s','sort small scan filter filter hash spark
&copy; 2026 example'),
(249,512,8,'Doc 249
Home &raquo; Docs
Doc 249
order table key key filter','slow hash filter batch a join filter key
&copy; 2026 example'),
(250,328,8,'Doc 250
Home &raquo; Docs
Doc 250
value spark order filter v','ata scan agg group spark window customer
&copy; 2026 example'),
(251,603,8,'Doc 251
Home &raquo; Docs
Doc 251
part window fast group mer',' fast fast query group vector slow spark
&copy; 2026 example'),
(252,333,8,'Doc 252
Home &raquo; Docs
Doc 252
spark window filter value ',' customer merge a merge merge merge line
&copy; 2026 example'),
(253,278,8,'Doc 253
Home &raquo; Docs
Doc 253
key query merge sort slow ','he table line big table spark agg a data
&copy; 2026 example'),
(254,183,8,'Doc 254
Home &raquo; Docs
Doc 254
key sort table sort vector','eta
AB size <10>
agg order column column
&copy; 2026 example'),
(255,237,8,'Doc 255
Home &raquo; Docs
Doc 255
row spark slow merge custo','row line slow customer hash a merge data
&copy; 2026 example'),
(256,142,7,'Doc 256
Home &raquo; Docs
Doc 256
group merge query scan sor','y query filter
alpha & beta
AB size <10>
&copy; 2026 example'),
(257,195,8,'Doc 257
Home &raquo; Docs
Doc 257
the value sort vector agg ',' <10>
w data stream slow data small fast
&copy; 2026 example'),
(258,476,8,'Doc 258
Home &raquo; Docs
Doc 258
small small the merge batc',' sort spark stream customer merge fast a
&copy; 2026 example'),
(259,339,8,'Doc 259
Home &raquo; Docs
Doc 259
line data slow data a vect',' agg agg vector column spark scan column
&copy; 2026 example'),
(260,215,8,'Doc 260
Home &raquo; Docs
Doc 260
order part slow big hash t','order agg order key small the spark line
&copy; 2026 example'),
(261,553,8,'Doc 261
Home &raquo; Docs
Doc 261
a data small hash big row ',' a line big row vector part batch stream
&copy; 2026 example'),
(262,336,8,'Doc 262
Home &raquo; Docs
Doc 262
a column data hash window ','he data table the the slow filter a fast
&copy; 2026 example'),
(263,528,8,'Doc 263
Home &raquo; Docs
Doc 263
data a big value table bat','er big line filter stream a group vector
&copy; 2026 example'),
(264,625,8,'Doc 264
Home &raquo; Docs
Doc 264
table order scan scan part','a data agg batch line slow customer join
&copy; 2026 example'),
(265,349,8,'Doc 265
Home &raquo; Docs
Doc 265
table hash join big stream','rt merge column group small value column
&copy; 2026 example'),
(266,306,8,'Doc 266
Home &raquo; Docs
Doc 266
line key filter join group','n agg scan a row customer small customer
&copy; 2026 example'),
(267,504,8,'Doc 267
Home &raquo; Docs
Doc 267
merge group part scan row ','rge table join row slow hash batch small
&copy; 2026 example'),
(268,296,8,'Doc 268
Home &raquo; Docs
Doc 268
data join stream a row the','l small table agg hash merge order batch
&copy; 2026 example'),
(269,547,8,'Doc 269
Home &raquo; Docs
Doc 269
data scan slow slow hash s','ne key group stream spark scan hash part
&copy; 2026 example'),
(270,579,8,'Doc 270
Home &raquo; Docs
Doc 270
column filter row merge a ','customer query fast big hash stream data
&copy; 2026 example'),
(271,375,8,'Doc 271
Home &raquo; Docs
Doc 271
window spark sort scan agg','ow row a vector slow batch group row big
&copy; 2026 example'),
(272,567,8,'Doc 272
Home &raquo; Docs
Doc 272
slow fast join part filter',' hash stream sort line column small join
&copy; 2026 example'),
(273,238,8,'Doc 273
Home &raquo; Docs
Doc 273
agg table window scan tabl','rge order part sort value key scan query
&copy; 2026 example'),
(274,617,8,'Doc 274
Home &raquo; Docs
Doc 274
window sort the sort big s','tream batch row batch part row sort sort
&copy; 2026 example'),
(275,129,7,'Doc 275
Home &raquo; Docs
Doc 275
a row a window merge hash ','oup order join
alpha & beta
AB size <10>
&copy; 2026 example'),
(276,618,8,'Doc 276
Home &raquo; Docs
Doc 276
window hash small customer','r part order small scan data table table
&copy; 2026 example'),
(277,243,8,'Doc 277
Home &raquo; Docs
Doc 277
query spark query spark sp','erge hash value data fast key a row join
&copy; 2026 example'),
(278,475,8,'Doc 278
Home &raquo; Docs
Doc 278
row table column spark has','column column column filter small column
&copy; 2026 example'),
(279,361,8,'Doc 279
Home &raquo; Docs
Doc 279
value a slow small batch f','h vector scan column column filter table
&copy; 2026 example'),
(280,550,8,'Doc 280
Home &raquo; Docs
Doc 280
scan window value fast agg','ig fast hash order join fast merge spark
&copy; 2026 example'),
(281,251,8,'Doc 281
Home &raquo; Docs
Doc 281
row key slow merge custome','line column filter sort filter merge row
&copy; 2026 example'),
(282,259,8,'Doc 282
Home &raquo; Docs
Doc 282
a column scan small stream','tream data spark batch sort batch filter
&copy; 2026 example'),
(283,552,8,'Doc 283
Home &raquo; Docs
Doc 283
customer hash customer agg',' window big vector slow batch part group
&copy; 2026 example'),
(284,359,8,'Doc 284
Home &raquo; Docs
Doc 284
batch agg data line value ','r spark scan fast key the data spark row
&copy; 2026 example'),
(285,592,8,'Doc 285
Home &raquo; Docs
Doc 285
group fast fast data row d','e hash scan value data slow big hash dup
&copy; 2026 example'),
(286,339,8,'Doc 286
Home &raquo; Docs
Doc 286
value a join query row que','or table slow slow batch agg stream hash
&copy; 2026 example'),
(287,182,8,'Doc 287
Home &raquo; Docs
Doc 287
customer merge sort group ',' beta
AB size <10>
eam spark vector hash
&copy; 2026 example'),
(288,256,8,'Doc 288
Home &raquo; Docs
Doc 288
a key part scan scan custo','window a query slow customer small small
&copy; 2026 example'),
(289,304,8,'Doc 289
Home &raquo; Docs
Doc 289
a group stream merge merge','w table fast slow table hash window fast
&copy; 2026 example'),
(290,611,8,'Doc 290
Home &raquo; Docs
Doc 290
spark scan spark table has',' small group scan vector spark batch dup
&copy; 2026 example'),
(291,497,8,'Doc 291
Home &raquo; Docs
Doc 291
join key scan spark query ',' join merge stream order window a column
&copy; 2026 example'),
(292,538,8,'Doc 292
Home &raquo; Docs
Doc 292
batch merge query fast vec','r line part batch join the row batch agg
&copy; 2026 example'),
(293,465,8,'Doc 293
Home &raquo; Docs
Doc 293
column stream spark hash g',' filter order fast group group big group
&copy; 2026 example'),
(294,551,8,'Doc 294
Home &raquo; Docs
Doc 294
row hash agg value column ','gg a scan big the the batch group column
&copy; 2026 example'),
(295,267,8,'Doc 295
Home &raquo; Docs
Doc 295
order filter query key vec','art data join value slow table small dup
&copy; 2026 example'),
(296,439,8,'Doc 296
Home &raquo; Docs
Doc 296
batch fast join vector big','ector line hash agg key line join vector
&copy; 2026 example'),
(297,403,8,'Doc 297
Home &raquo; Docs
Doc 297
part key table row data or','line spark stream line part the the line
&copy; 2026 example'),
(298,270,8,'Doc 298
Home &raquo; Docs
Doc 298
order filter vector batch ','umn key small value fast column key part
&copy; 2026 example'),
(299,582,8,'Doc 299
Home &raquo; Docs
Doc 299
query table spark data joi','or a row customer hash order join vector
&copy; 2026 example'),
(300,297,8,'Doc 300
Home &raquo; Docs
Doc 300
vector vector stream strea','stream fast customer agg big query small
&copy; 2026 example'),
(301,588,8,'Doc 301
Home &raquo; Docs
Doc 301
group fast fast data row d',' line hash scan value data slow big hash
&copy; 2026 example'),
(302,564,8,'Doc 302
Home &raquo; Docs
Doc 302
table a join fast spark co','or sort group group batch agg value scan
&copy; 2026 example'),
(303,535,8,'Doc 303
Home &raquo; Docs
Doc 303
customer small filter hash','alue a value column customer filter fast
&copy; 2026 example'),
(304,300,8,'Doc 304
Home &raquo; Docs
Doc 304
row column value batch que',' the batch filter merge batch part table
&copy; 2026 example'),
(305,143,7,'Doc 305
Home &raquo; Docs
Doc 305
filter stream agg small fi','eam small join
alpha & beta
AB size <10>
&copy; 2026 example'),
(306,501,8,'Doc 306
Home &raquo; Docs
Doc 306
order value stream table v','eam agg slow the stream value line small
&copy; 2026 example'),
(307,383,8,'Doc 307
Home &raquo; Docs
Doc 307
the big filter group small','scan customer query big spark part batch
&copy; 2026 example'),
(308,177,8,'Doc 308
Home &raquo; Docs
Doc 308
batch scan window value fi','pha & beta
AB size <10>
slow scan vector
&copy; 2026 example'),
(309,319,8,'Doc 309
Home &raquo; Docs
Doc 309
row small column agg value','e hash the fast agg scan fast group fast
&copy; 2026 example'),
(310,229,8,'Doc 310
Home &raquo; Docs
Doc 310
merge join table a slow pa','mer part row query query fast filter big
&copy; 2026 example'),
(311,576,8,'Doc 311
Home &raquo; Docs
Doc 311
merge join vector the orde',' filter value hash spark query row merge
&copy; 2026 example'),
(312,449,8,'Doc 312
Home &raquo; Docs
Doc 312
sort filter table agg big ','window stream group small slow the group
&copy; 2026 example'),
(313,168,8,'Doc 313
Home &raquo; Docs
Doc 313
filter scan part a data so','ark th
alpha & beta
AB size <10>
e value
&copy; 2026 example'),
(314,271,8,'Doc 314
Home &raquo; Docs
Doc 314
customer merge agg stream ','rk agg agg order line column slow window
&copy; 2026 example'),
(315,541,8,'Doc 315
Home &raquo; Docs
Doc 315
group small data line agg ','e a merge key order join order hash scan
&copy; 2026 example'),
(316,488,8,'Doc 316
Home &raquo; Docs
Doc 316
scan data a vector key sma','er scan value slow scan batch small join
&copy; 2026 example'),
(317,489,8,'Doc 317
Home &raquo; Docs
Doc 317
merge value data batch fil','ow stream line sort agg a key spark data
&copy; 2026 example'),
(318,537,8,'Doc 318
Home &raquo; Docs
Doc 318
stream customer row hash c',' order big part filter agg join a a fast
&copy; 2026 example'),
(319,593,8,'Doc 319
Home &raquo; Docs
Doc 319
agg stream fast stream ord',' column spark merge sort merge merge key
&copy; 2026 example'),
(320,485,8,'Doc 320
Home &raquo; Docs
Doc 320
the big column merge fast ',' fast data query value vector value line
&copy; 2026 example'),
(321,373,8,'Doc 321
Home &raquo; Docs
Doc 321
stream vector sort column ',' merge value value big window merge data
&copy; 2026 example'),
(322,336,8,'Doc 322
Home &raquo; Docs
Doc 322
table window big column fa','lumn fast big order column filter vector
&copy; 2026 example'),
(323,412,8,'Doc 323
Home &raquo; Docs
Doc 323
query column group agg fil',' fast customer join vector fast sort dup
&copy; 2026 example'),
(324,309,8,'Doc 324
Home &raquo; Docs
Doc 324
group line slow window slo','ey hash value line fast group slow value
&copy; 2026 example'),
(325,408,8,'Doc 325
Home &raquo; Docs
Doc 325
table small value column m','tor hash row value query a key spark big
&copy; 2026 example'),
(326,278,8,'Doc 326
Home &raquo; Docs
Doc 326
scan key hash merge line k',' line merge part group vector vector agg
&copy; 2026 example'),
(327,262,8,'Doc 327
Home &raquo; Docs
Doc 327
group join merge row key s','window query batch row small filter fast
&copy; 2026 example'),
(328,576,8,'Doc 328
Home &raquo; Docs
Doc 328
join row big stream small ','roup query join small row customer merge
&copy; 2026 example'),
(329,433,8,'Doc 329
Home &raquo; Docs
Doc 329
merge batch big row sort h','lter a row customer value group key join
&copy; 2026 example'),
(330,397,8,'Doc 330
Home &raquo; Docs
Doc 330
big agg order the group ha','data join big small table part row query
&copy; 2026 example'),
(331,380,8,'Doc 331
Home &raquo; Docs
Doc 331
customer value small join ','eam column part line spark filter filter
&copy; 2026 example'),
(332,288,8,'Doc 332
Home &raquo; Docs
Doc 332
spark column vector stream','tream batch scan column spark group hash
&copy; 2026 example'),
(333,258,8,'Doc 333
Home &raquo; Docs
Doc 333
hash query data big table ','w value fast hash window sort value slow
&copy; 2026 example'),
(334,565,8,'Doc 334
Home &raquo; Docs
Doc 334
join key value small join ','l slow slow agg slow slow the join batch
&copy; 2026 example'),
(335,406,8,'Doc 335
Home &raquo; Docs
Doc 335
column slow filter data cu',' small vector small vector merge batch a
&copy; 2026 example'),
(336,457,8,'Doc 336
Home &raquo; Docs
Doc 336
table hash customer column','ash filter key line query scan a key big
&copy; 2026 example'),
(337,323,8,'Doc 337
Home &raquo; Docs
Doc 337
filter part column group v','w fast spark merge slow table line small
&copy; 2026 example'),
(338,172,8,'Doc 338
Home &raquo; Docs
Doc 338
data join query spark valu',' v
alpha & beta
AB size <10>
alue a join
&copy; 2026 example'),
(339,268,8,'Doc 339
Home &raquo; Docs
Doc 339
vector vector column strea','part value row hash key hash row a table
&copy; 2026 example'),
(340,328,8,'Doc 340
Home &raquo; Docs
Doc 340
batch group hash group dat','g small merge big line key a spark order
&copy; 2026 example'),
(341,507,8,'Doc 341
Home &raquo; Docs
Doc 341
part part small row scan f','batch merge hash merge batch window scan
&copy; 2026 example'),
(342,197,8,'Doc 342
Home &raquo; Docs
Doc 342
value vector hash key vect','10>
ash part value scan vector sort join
&copy; 2026 example'),
(343,236,8,'Doc 343
Home &raquo; Docs
Doc 343
row slow data data merge s','tch customer data spark filter line part
&copy; 2026 example'),
(344,498,8,'Doc 344
Home &raquo; Docs
Doc 344
row key query part order h','w customer big row agg stream merge scan
&copy; 2026 example'),
(345,404,8,'Doc 345
Home &raquo; Docs
Doc 345
line data vector sort line','l part agg stream stream part scan order
&copy; 2026 example'),
(346,490,8,'Doc 346
Home &raquo; Docs
Doc 346
fast data customer filter ',' key slow table batch sort line slow key
&copy; 2026 example'),
(347,362,8,'Doc 347
Home &raquo; Docs
Doc 347
filter query agg query fas','y query batch data fast hash batch batch
&copy; 2026 example'),
(348,212,8,'Doc 348
Home &raquo; Docs
Doc 348
batch order stream batch v',' part fast fast join big spark query row
&copy; 2026 example'),
(349,537,8,'Doc 349
Home &raquo; Docs
Doc 349
query row join hash agg co','t spark batch data small column fast the
&copy; 2026 example'),
(350,548,8,'Doc 350
Home &raquo; Docs
Doc 350
batch join sort value quer','l window query big part stream scan data
&copy; 2026 example'),
(351,448,8,'Doc 351
Home &raquo; Docs
Doc 351
a order data query query f','join order column group big group stream
&copy; 2026 example'),
(352,617,8,'Doc 352
Home &raquo; Docs
Doc 352
a fast order part the sort','umn join vector slow join customer order
&copy; 2026 example'),
(353,395,8,'Doc 353
Home &raquo; Docs
Doc 353
customer a batch agg order','ctor small value small customer a vector
&copy; 2026 example'),
(354,507,8,'Doc 354
Home &raquo; Docs
Doc 354
customer slow sort vector ','r agg window data big key order customer
&copy; 2026 example'),
(355,434,8,'Doc 355
Home &raquo; Docs
Doc 355
spark order scan the batch','low customer join window window customer
&copy; 2026 example'),
(356,440,8,'Doc 356
Home &raquo; Docs
Doc 356
key key fast order small g','small scan row value key small group agg
&copy; 2026 example'),
(357,333,8,'Doc 357
Home &raquo; Docs
Doc 357
hash a sort filter key has',' sort fast fast fast the window big data
&copy; 2026 example'),
(358,139,7,'Doc 358
Home &raquo; Docs
Doc 358
join line fast join spark ','an spark order
alpha & beta
AB size <10>
&copy; 2026 example'),
(359,409,8,'Doc 359
Home &raquo; Docs
Doc 359
sort part part small slow ','lue table sort a hash the agg scan merge
&copy; 2026 example'),
(360,523,8,'Doc 360
Home &raquo; Docs
Doc 360
vector value small data me','park hash small batch fast big value the
&copy; 2026 example'),
(361,444,8,'Doc 361
Home &raquo; Docs
Doc 361
window row scan scan table','scan slow column merge batch scan window
&copy; 2026 example'),
(362,162,8,'Doc 362
Home &raquo; Docs
Doc 362
slow data group query spar','roup the sor
alpha & beta
AB size <10>
t
&copy; 2026 example'),
(363,438,8,'Doc 363
Home &raquo; Docs
Doc 363
merge table column vector ','olumn scan agg hash a window batch order
&copy; 2026 example'),
(364,351,8,'Doc 364
Home &raquo; Docs
Doc 364
fast column column line bi',' data batch table key slow data customer
&copy; 2026 example'),
(365,147,7,'Doc 365
Home &raquo; Docs
Doc 365
vector spark agg part merg','ort batch hash
alpha & beta
AB size <10>
&copy; 2026 example'),
(366,392,8,'Doc 366
Home &raquo; Docs
Doc 366
line column value order li','part filter scan a order table sort data
&copy; 2026 example'),
(367,293,8,'Doc 367
Home &raquo; Docs
Doc 367
scan key vector a row hash','ow table order join row query hash small
&copy; 2026 example'),
(368,153,7,'Doc 368
Home &raquo; Docs
Doc 368
agg fast value batch spark','e spark stream
alpha & beta
AB size <10>
&copy; 2026 example'),
(369,354,8,'Doc 369
Home &raquo; Docs
Doc 369
sort join join small group','atch sort big slow table row column hash
&copy; 2026 example'),
(370,327,8,'Doc 370
Home &raquo; Docs
Doc 370
part spark table order cus',' batch order query data sort stream scan
&copy; 2026 example'),
(371,431,8,'Doc 371
Home &raquo; Docs
Doc 371
window big row window big ',' stream table part stream line the query
&copy; 2026 example'),
(372,223,8,'Doc 372
Home &raquo; Docs
Doc 372
column big group sort fast','atch row slow hash customer merge window
&copy; 2026 example'),
(373,468,8,'Doc 373
Home &raquo; Docs
Doc 373
merge line batch table the',' the hash the row query merge data value
&copy; 2026 example'),
(374,263,8,'Doc 374
Home &raquo; Docs
Doc 374
order filter query key vec','mn part data join value slow table small
&copy; 2026 example'),
(375,423,8,'Doc 375
Home &raquo; Docs
Doc 375
stream row row order the s','roup merge a row batch filter small join
&copy; 2026 example'),
(376,447,8,'Doc 376
Home &raquo; Docs
Doc 376
data join join scan vector','ort row group spark order window batch a
&copy; 2026 example'),
(377,315,8,'Doc 377
Home &raquo; Docs
Doc 377
hash sort filter customer ',' big part join hash stream part sort dup
&copy; 2026 example'),
(378,418,8,'Doc 378
Home &raquo; Docs
Doc 378
sort small table scan stre','e scan group sort a join window line the
&copy; 2026 example'),
(379,484,8,'Doc 379
Home &raquo; Docs
Doc 379
spark stream fast join win','ark big window customer slow table value
&copy; 2026 example'),
(380,524,8,'Doc 380
Home &raquo; Docs
Doc 380
window the sort small data','ter fast a spark value filter agg window
&copy; 2026 example'),
(381,434,8,'Doc 381
Home &raquo; Docs
Doc 381
scan join data batch agg a','er part hash filter scan line group hash
&copy; 2026 example'),
(382,213,8,'Doc 382
Home &raquo; Docs
Doc 382
customer slow key data fil',' batch small fast the hash merge the agg
&copy; 2026 example'),
(383,335,8,'Doc 383
Home &raquo; Docs
Doc 383
the a column batch custome',' small row part big line filter hash dup
&copy; 2026 example'),
(384,173,8,'Doc 384
Home &raquo; Docs
Doc 384
key agg part sort join sor','a
alpha & beta
AB size <10>
ta order agg
&copy; 2026 example'),
(385,480,8,'Doc 385
Home &raquo; Docs
Doc 385
customer big scan line cus','mer hash stream order a window batch the
&copy; 2026 example'),
(386,552,8,'Doc 386
Home &raquo; Docs
Doc 386
filter hash row line join ','atch the fast agg spark customer a spark
&copy; 2026 example'),
(387,289,8,'Doc 387
Home &raquo; Docs
Doc 387
hash query group row line ','r scan vector query filter spark key big
&copy; 2026 example'),
(388,426,8,'Doc 388
Home &raquo; Docs
Doc 388
line sort merge group filt',' filter group merge window slow agg slow
&copy; 2026 example'),
(389,233,8,'Doc 389
Home &raquo; Docs
Doc 389
merge join table a slow pa','part row query query fast filter big dup
&copy; 2026 example'),
(390,217,8,'Doc 390
Home &raquo; Docs
Doc 390
slow batch row a a the que','ow key part small small part value spark
&copy; 2026 example'),
(391,319,8,'Doc 391
Home &raquo; Docs
Doc 391
window order spark column ','r order key join data window data column
&copy; 2026 example'),
(392,216,8,'Doc 392
Home &raquo; Docs
Doc 392
vector group column order ','e spark table hash big window line order
&copy; 2026 example'),
(393,546,8,'Doc 393
Home &raquo; Docs
Doc 393
fast merge sort fast fast ','der sort fast column merge spark big dup
&copy; 2026 example'),
(394,485,8,'Doc 394
Home &raquo; Docs
Doc 394
query customer join group ',' vector data slow batch order scan small
&copy; 2026 example'),
(395,560,8,'Doc 395
Home &raquo; Docs
Doc 395
group customer table order','atch group big small column filter merge
&copy; 2026 example'),
(396,329,8,'Doc 396
Home &raquo; Docs
Doc 396
big small batch small filt','tream big merge query query spark window
&copy; 2026 example'),
(397,375,8,'Doc 397
Home &raquo; Docs
Doc 397
table key data merge group','part order query merge window filter key
&copy; 2026 example'),
(398,186,8,'Doc 398
Home &raquo; Docs
Doc 398
sort group table column me','a
AB size <10>
uery row fast window hash
&copy; 2026 example'),
(399,390,8,'Doc 399
Home &raquo; Docs
Doc 399
column key sort window str',' small spark part table value agg vector
&copy; 2026 example'),
(400,214,8,'Doc 400
Home &raquo; Docs
Doc 400
data line line query batch','t line small agg agg filter batch column
&copy; 2026 example'),
(401,519,8,'Doc 401
Home &raquo; Docs
Doc 401
key join the a line line b','erge window small order sort stream hash
&copy; 2026 example'),
(402,241,8,'Doc 402
Home &raquo; Docs
Doc 402
big scan sort row part lin','t the the a customer the line spark line
&copy; 2026 example'),
(403,554,8,'Doc 403
Home &raquo; Docs
Doc 403
order window join filter f','query small data customer hash scan slow
&copy; 2026 example'),
(404,301,8,'Doc 404
Home &raquo; Docs
Doc 404
value slow data stream agg','ble hash merge fast scan hash small part
&copy; 2026 example'),
(405,394,8,'Doc 405
Home &raquo; Docs
Doc 405
hash customer key part str','indow line batch table stream small join
&copy; 2026 example'),
(406,541,8,'Doc 406
Home &raquo; Docs
Doc 406
table customer hash vector',' batch slow sort sort column order order
&copy; 2026 example'),
(407,188,8,'Doc 407
Home &raquo; Docs
Doc 407
hash table agg merge big k','B size <10>
merge query small batch scan
&copy; 2026 example'),
(408,167,8,'Doc 408
Home &raquo; Docs
Doc 408
query query spark part sor','ch fast
alpha & beta
AB size <10>
filter
&copy; 2026 example'),
(409,354,8,'Doc 409
Home &raquo; Docs
Doc 409
small key a spark window h','able column value window scan a part agg
&copy; 2026 example'),
(410,494,8,'Doc 410
Home &raquo; Docs
Doc 410
row order a table window v',' order fast query big window a fast part
&copy; 2026 example'),
(411,491,8,'Doc 411
Home &raquo; Docs
Doc 411
vector row spark a hash ag','e hash value join window a fast part agg
&copy; 2026 example'),
(412,446,8,'Doc 412
Home &raquo; Docs
Doc 412
agg row fast the table sca','can the fast join part a fast part small
&copy; 2026 example'),
(413,508,8,'Doc 413
Home &raquo; Docs
Doc 413
merge group part scan row ','table join row slow hash batch small dup
&copy; 2026 example'),
(414,489,8,'Doc 414
Home &raquo; Docs
Doc 414
part batch slow window sma',' slow sort a fast spark a slow group big
&copy; 2026 example'),
(415,394,8,'Doc 415
Home &raquo; Docs
Doc 415
the customer spark slow a ',' big hash fast value scan order the part
&copy; 2026 example'),
(416,368,8,'Doc 416
Home &raquo; Docs
Doc 416
key query order sort the s','omer merge the column sort key big small
&copy; 2026 example'),
(417,600,8,'Doc 417
Home &raquo; Docs
Doc 417
window query customer merg','ash table agg table a column stream sort
&copy; 2026 example'),
(418,520,8,'Doc 418
Home &raquo; Docs
Doc 418
agg row order batch line r','low agg join group key window line order
&copy; 2026 example'),
(419,195,8,'Doc 419
Home &raquo; Docs
Doc 419
row window data filter sma',' <10>
ery part value customer big column
&copy; 2026 example'),
(420,542,8,'Doc 420
Home &raquo; Docs
Doc 420
fast merge sort fast fast ','e order sort fast column merge spark big
&copy; 2026 example'),
(421,541,8,'Doc 421
Home &raquo; Docs
Doc 421
key line sort small row qu',' sort order a query customer column line
&copy; 2026 example'),
(422,445,8,'Doc 422
Home &raquo; Docs
Doc 422
join group window group va','ndow value table filter batch hash merge
&copy; 2026 example'),
(423,443,8,'Doc 423
Home &raquo; Docs
Doc 423
join order part group merg','small filter group table scan order fast
&copy; 2026 example'),
(424,490,8,'Doc 424
Home &raquo; Docs
Doc 424
join sort merge row stream','tor a filter vector batch merge customer
&copy; 2026 example'),
(425,211,8,'Doc 425
Home &raquo; Docs
Doc 425
a slow line join vector sp',' slow big the fast row vector value data
&copy; 2026 example'),
(426,532,8,'Doc 426
Home &raquo; Docs
Doc 426
merge fast sort fast value','ery customer line stream key hash stream
&copy; 2026 example'),
(427,501,8,'Doc 427
Home &raquo; Docs
Doc 427
a key window small data co','tch filter query window part query group
&copy; 2026 example'),
(428,360,8,'Doc 428
Home &raquo; Docs
Doc 428
filter slow row sort group','group stream column customer slow column
&copy; 2026 example'),
(429,618,8,'Doc 429
Home &raquo; Docs
Doc 429
query data column key key ','ash order line customer part fast filter
&copy; 2026 example'),
(430,480,8,'Doc 430
Home &raquo; Docs
Doc 430
customer sort value spark ','up batch fast hash the table scan stream
&copy; 2026 example'),
(431,388,8,'Doc 431
Home &raquo; Docs
Doc 431
vector spark big order slo','art order group table value small column
&copy; 2026 example'),
(432,439,8,'Doc 432
Home &raquo; Docs
Doc 432
scan hash agg table small ','ig value part stream query column column
&copy; 2026 example'),
(433,257,8,'Doc 433
Home &raquo; Docs
Doc 433
the slow join table batch ','spark agg agg value window big data line
&copy; 2026 example'),
(434,504,8,'Doc 434
Home &raquo; Docs
Doc 434
column query key big vecto','mall a table small merge order slow scan
&copy; 2026 example'),
(435,247,8,'Doc 435
Home &raquo; Docs
Doc 435
part stream agg scan table','ow hash query join scan order merge join
&copy; 2026 example'),
(436,357,8,'Doc 436
Home &raquo; Docs
Doc 436
group row window agg sort ',' window merge agg group small a customer
&copy; 2026 example'),
(437,521,8,'Doc 437
Home &raquo; Docs
Doc 437
order data value fast batc',' join key the value customer table small
&copy; 2026 example'),
(438,252,8,'Doc 438
Home &raquo; Docs
Doc 438
fast line order value merg','rt data vector merge key query slow fast
&copy; 2026 example'),
(439,265,8,'Doc 439
Home &raquo; Docs
Doc 439
group line batch small bat','ustomer agg hash window filter the query
&copy; 2026 example'),
(440,323,8,'Doc 440
Home &raquo; Docs
Doc 440
customer order the join pa','e stream query customer batch value data
&copy; 2026 example'),
(441,623,8,'Doc 441
Home &raquo; Docs
Doc 441
slow window small filter m',' key spark group vector vector row order
&copy; 2026 example'),
(442,535,8,'Doc 442
Home &raquo; Docs
Doc 442
stream query order value p',' group fast small filter line scan order
&copy; 2026 example'),
(443,361,8,'Doc 443
Home &raquo; Docs
Doc 443
big filter a the row slow ','e stream vector key column window filter
&copy; 2026 example'),
(444,500,8,'Doc 444
Home &raquo; Docs
Doc 444
key filter vector join ord','agg key sort column a window data column
&copy; 2026 example'),
(445,388,8,'Doc 445
Home &raquo; Docs
Doc 445
small scan data agg query ',' a table spark filter line data big slow
&copy; 2026 example'),
(446,213,8,'Doc 446
Home &raquo; Docs
Doc 446
data data sort agg scan va','w line row stream value order filter dup
&copy; 2026 example'),
(447,586,8,'Doc 447
Home &raquo; Docs
Doc 447
the column customer data s','able line row order join value key table
&copy; 2026 example'),
(448,366,8,'Doc 448
Home &raquo; Docs
Doc 448
slow line join group filte','ery table scan query query part data the
&copy; 2026 example'),
(449,257,8,'Doc 449
Home &raquo; Docs
Doc 449
filter the scan key row ro','er fast merge spark join group line scan
&copy; 2026 example'),
(450,222,8,'Doc 450
Home &raquo; Docs
Doc 450
the spark query slow small',' vector hash order data query join order
&copy; 2026 example'),
(451,193,8,'Doc 451
Home &raquo; Docs
Doc 451
a part vector hash key vec','ze <10>
can group slow stream slow query
&copy; 2026 example'),
(452,439,8,'Doc 452
Home &raquo; Docs
Doc 452
row scan small the fast gr','n batch fast merge row query line stream
&copy; 2026 example'),
(453,600,8,'Doc 453
Home &raquo; Docs
Doc 453
filter table part window s','scan line row column sort the order line
&copy; 2026 example'),
(454,234,8,'Doc 454
Home &raquo; Docs
Doc 454
stream row customer a batc','table fast filter filter big group merge
&copy; 2026 example'),
(455,139,7,'Doc 455
Home &raquo; Docs
Doc 455
table small sort order sma',' big key group
alpha & beta
AB size <10>
&copy; 2026 example'),
(456,195,8,'Doc 456
Home &raquo; Docs
Doc 456
fast join key hash spark k',' <10>
ector a part slow agg the big line
&copy; 2026 example'),
(457,282,8,'Doc 457
Home &raquo; Docs
Doc 457
scan key hash merge line k','e merge part group vector vector agg dup
&copy; 2026 example'),
(458,404,8,'Doc 458
Home &raquo; Docs
Doc 458
key line join order value ','table spark key window vector column big
&copy; 2026 example'),
(459,457,8,'Doc 459
Home &raquo; Docs
Doc 459
batch vector row stream ke',' vector query big merge join part vector
&copy; 2026 example'),
(460,341,8,'Doc 460
Home &raquo; Docs
Doc 460
agg scan column key spark ','park hash group query merge slow table a
&copy; 2026 example'),
(461,452,8,'Doc 461
Home &raquo; Docs
Doc 461
row merge vector big order','rder row value batch batch a fast vector
&copy; 2026 example'),
(462,408,8,'Doc 462
Home &raquo; Docs
Doc 462
key line join order value ','e spark key window vector column big dup
&copy; 2026 example'),
(463,572,8,'Doc 463
Home &raquo; Docs
Doc 463
filter the column table bi','der big order query merge stream the agg
&copy; 2026 example'),
(464,285,8,'Doc 464
Home &raquo; Docs
Doc 464
batch vector part the the ',' order filter hash customer customer row
&copy; 2026 example'),
(465,400,8,'Doc 465
Home &raquo; Docs
Doc 465
line stream query customer','indow key scan key order table group big
&copy; 2026 example'),
(466,551,8,'Doc 466
Home &raquo; Docs
Doc 466
batch data hash a value a ','olumn filter fast table window key value
&copy; 2026 example'),
(467,441,8,'Doc 467
Home &raquo; Docs
Doc 467
sort data data window agg ',' part order row vector column agg filter
&copy; 2026 example'),
(468,288,8,'Doc 468
Home &raquo; Docs
Doc 468
column slow key order key ','w data column window key join small slow
&copy; 2026 example'),
(469,137,7,'Doc 469
Home &raquo; Docs
Doc 469
row line batch part query ','m order stream
alpha & beta
AB size <10>
&copy; 2026 example'),
(470,312,8,'Doc 470
Home &raquo; Docs
Doc 470
agg customer key batch que','n line small part customer key row small
&copy; 2026 example'),
(471,416,8,'Doc 471
Home &raquo; Docs
Doc 471
batch small vector table s','column data slow agg join slow spark big
&copy; 2026 example'),
(472,289,8,'Doc 472
Home &raquo; Docs
Doc 472
agg stream stream fast fil','t fast fast part window query batch scan
&copy; 2026 example'),
(473,374,8,'Doc 473
Home &raquo; Docs
Doc 473
batch agg sort sort vector','r row stream stream value line group big
&copy; 2026 example'),
(474,437,8,'Doc 474
Home &raquo; Docs
Doc 474
order query key slow the f',' a value table scan filter data scan the
&copy; 2026 example'),
(475,157,7,'Doc 475
Home &raquo; Docs
Doc 475
line spark small key merge',' agg the value
alpha & beta
AB size <10>
&copy; 2026 example'),
(476,164,8,'Doc 476
Home &raquo; Docs
Doc 476
hash vector part spark bat','ilter hash
alpha & beta
AB size <10>
key
&copy; 2026 example'),
(477,231,8,'Doc 477
Home &raquo; Docs
Doc 477
line slow value window lin','rge merge a a value value join scan data
&copy; 2026 example'),
(478,371,8,'Doc 478
Home &raquo; Docs
Doc 478
window line join the batch','filter small filter fast hash spark sort
&copy; 2026 example'),
(479,469,8,'Doc 479
Home &raquo; Docs
Doc 479
sort merge line hash data ','ine slow order agg line join spark query
&copy; 2026 example'),
(480,440,8,'Doc 480
Home &raquo; Docs
Doc 480
part key part order row or',' hash column query vector the data big a
&copy; 2026 example'),
(481,165,8,'Doc 481
Home &raquo; Docs
Doc 481
line vector value agg grou','lue line
alpha & beta
AB size <10>
group
&copy; 2026 example'),
(482,245,8,'Doc 482
Home &raquo; Docs
Doc 482
filter merge customer sort','ream filter stream batch scan slow value
&copy; 2026 example'),
(483,326,8,'Doc 483
Home &raquo; Docs
Doc 483
join table slow join custo','big the query fast batch sort table hash
&copy; 2026 example'),
(484,301,8,'Doc 484
Home &raquo; Docs
Doc 484
value fast big row a scan ','eam column slow column data fast agg key
&copy; 2026 example'),
(485,210,8,'Doc 485
Home &raquo; Docs
Doc 485
spark column window data q','tomer small the vector small filter line
&copy; 2026 example'),
(486,251,8,'Doc 486
Home &raquo; Docs
Doc 486
part stream agg scan table','ash query join scan order merge join dup
&copy; 2026 example'),
(487,402,8,'Doc 487
Home &raquo; Docs
Doc 487
key window small key a sma','ash query key data stream customer agg a
&copy; 2026 example'),
(488,286,8,'Doc 488
Home &raquo; Docs
Doc 488
value join column join col','part line sort value big spark slow sort
&copy; 2026 example'),
(489,397,8,'Doc 489
Home &raquo; Docs
Doc 489
customer scan order fast s','k vector big spark agg big hash big join
&copy; 2026 example'),
(490,352,8,'Doc 490
Home &raquo; Docs
Doc 490
window query a the sort pa',' key window customer window group column
&copy; 2026 example'),
(491,449,8,'Doc 491
Home &raquo; Docs
Doc 491
column batch data table me','ery the key value vector scan row filter
&copy; 2026 example'),
(492,157,7,'Doc 492
Home &raquo; Docs
Doc 492
value table vector merge m',' big big query
alpha & beta
AB size <10>
&copy; 2026 example'),
(493,545,8,'Doc 493
Home &raquo; Docs
Doc 493
filter join hash join quer','an the key column row data customer line
&copy; 2026 example'),
(494,287,8,'Doc 494
Home &raquo; Docs
Doc 494
sort table big stream merg','ark scan vector scan customer spark data
&copy; 2026 example'),
(495,465,8,'Doc 495
Home &raquo; Docs
Doc 495
filter hash spark table th',' a row column table row vector scan line
&copy; 2026 example'),
(496,538,8,'Doc 496
Home &raquo; Docs
Doc 496
the query filter column gr',' hash join value order key hash customer
&copy; 2026 example'),
(497,203,8,'Doc 497
Home &raquo; Docs
Doc 497
window stream vector merge','stomer hash data customer join row small
&copy; 2026 example'),
(498,566,8,'Doc 498
Home &raquo; Docs
Doc 498
value fast part scan fast ','rder column row agg fast merge value row
&copy; 2026 example'),
(499,247,8,'Doc 499
Home &raquo; Docs
Doc 499
line big a small group the','ig vector a vector value line data spark
&copy; 2026 example')
) AS t(doc_id, n_chars_html, n_lines, head60, tail60)
ORDER BY doc_id