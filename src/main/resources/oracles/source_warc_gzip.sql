SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(target_uri AS VARCHAR) AS target_uri, CAST(warc_type AS VARCHAR) AS warc_type, CAST(n_chars_ext AS BIGINT) AS n_chars_ext, CAST(head60 AS VARCHAR) AS head60
FROM (VALUES
(0,'https://example.org/doc/0','response',171,'Doc «0»
Doc 0
key agg row scan slow fast table value part ha'),
(1,'https://example.org/doc/1','response',420,'Doc «1»
Doc 1
batch window spark order data column agg join '),
(2,'https://example.org/doc/2','response',260,'Doc «2»
Doc 2
small fast slow filter value small value table'),
(3,'https://example.org/doc/3','response',161,'Doc «3»
Doc 3
window merge spark merge batch table a big a j'),
(4,'https://example.org/doc/4','response',264,'Doc «4»
Doc 4
data query small row slow row data stream filt'),
(5,'https://example.org/doc/5','response',328,'Doc «5»
Doc 5
agg table spark hash sort key vector fast join'),
(6,'https://example.org/doc/6','response',92,'Doc «6»
Doc 6
agg small scan table group scan order row merg'),
(7,'https://example.org/doc/7','response',416,'Doc «7»
Doc 7
batch window vector hash fast part window the '),
(8,'https://example.org/doc/8','response',484,'Doc «8»
Doc 8
the spark join stream a small order merge colu'),
(9,'https://example.org/doc/9','response',405,'Doc «9»
Doc 9
order small line key filter column order the o'),
(10,'https://example.org/doc/10','response',230,'Doc «10»
Doc 10
order scan agg batch a small stream value ta'),
(11,'https://example.org/doc/11','response',320,'Doc «11»
Doc 11
the big data merge data spark merge stream p'),
(12,'https://example.org/doc/12','response',364,'Doc «12»
Doc 12
batch small fast slow a a order vector scan '),
(13,'https://example.org/doc/13','response',362,'Doc «13»
Doc 13
window query order value query hash agg the '),
(14,'https://example.org/doc/14','response',511,'Doc «14»
Doc 14
stream small agg the group stream line group'),
(15,'https://example.org/doc/15','response',244,'Doc «15»
Doc 15
order merge small table group batch key orde'),
(16,'https://example.org/doc/16','response',106,'Doc «16»
Doc 16
line vector order slow data column fast line'),
(17,'https://example.org/doc/17','response',442,'Doc «17»
Doc 17
key a small data filter column part row wind'),
(18,'https://example.org/doc/18','response',439,'Doc «18»
Doc 18
merge small agg slow small value fast hash a'),
(19,'https://example.org/doc/19','response',73,'Doc «19»
Doc 19
vector scan row filter vector sort query fas'),
(20,'https://example.org/doc/20','response',410,'Doc «20»
Doc 20
window part slow customer join the scan big '),
(21,'https://example.org/doc/21','response',233,'Doc «21»
Doc 21
key order join customer batch row data custo'),
(22,'https://example.org/doc/22','response',470,'Doc «22»
Doc 22
slow sort small join column a group order li'),
(23,'https://example.org/doc/23','response',182,'Doc «23»
Doc 23
filter slow the data customer sort agg query'),
(24,'https://example.org/doc/24','response',551,'Doc «24»
Doc 24
sort a spark table stream sort data merge li'),
(25,'https://example.org/doc/25','response',521,'Doc «25»
Doc 25
merge fast query fast column fast agg small '),
(26,'https://example.org/doc/26','response',79,'Doc «26»
Doc 26
table small sort order small hash stream dat'),
(27,'https://example.org/doc/27','response',362,'Doc «27»
Doc 27
key small customer spark merge slow scan sca'),
(28,'https://example.org/doc/28','response',350,'Doc «28»
Doc 28
query hash key line spark agg fast slow row '),
(29,'https://example.org/doc/29','response',212,'Doc «29»
Doc 29
table small window vector a the scan vector '),
(30,'https://example.org/doc/30','response',183,'Doc «30»
Doc 30
key row sort small key a batch table batch s'),
(31,'https://example.org/doc/31','response',266,'Doc «31»
Doc 31
the a column batch customer value vector lin'),
(32,'https://example.org/doc/32','response',529,'Doc «32»
Doc 32
table join row merge window window vector cu'),
(33,'https://example.org/doc/33','response',263,'Doc «33»
Doc 33
line column merge fast hash fast spark fast '),
(34,'https://example.org/doc/34','response',181,'Doc «34»
Doc 34
sort table merge row order scan small vector'),
(35,'https://example.org/doc/35','response',468,'Doc «35»
Doc 35
filter join join big agg key filter a a tabl'),
(36,'https://example.org/doc/36','response',151,'Doc «36»
Doc 36
stream value data value line merge customer '),
(37,'https://example.org/doc/37','response',394,'Doc «37»
Doc 37
data scan a stream small scan fast group par'),
(38,'https://example.org/doc/38','response',219,'Doc «38»
Doc 38
merge group small line window customer slow '),
(39,'https://example.org/doc/39','response',140,'Doc «39»
Doc 39
small window sort row column spark the hash '),
(40,'https://example.org/doc/40','response',437,'Doc «40»
Doc 40
order scan line hash line window column cust'),
(41,'https://example.org/doc/41','response',353,'Doc «41»
Doc 41
line group batch key merge join table batch '),
(42,'https://example.org/doc/42','response',319,'Doc «42»
Doc 42
group column key window join group window sc'),
(43,'https://example.org/doc/43','response',168,'Doc «43»
Doc 43
stream group small the filter part scan slow'),
(44,'https://example.org/doc/44','response',144,'Doc «44»
Doc 44
data data sort agg scan value the hash colum'),
(45,'https://example.org/doc/45','response',448,'Doc «45»
Doc 45
merge group part scan row value column batch'),
(46,'https://example.org/doc/46','response',508,'Doc «46»
Doc 46
scan stream agg small customer merge custome'),
(47,'https://example.org/doc/47','response',240,'Doc «47»
Doc 47
a column merge small value merge agg column '),
(48,'https://example.org/doc/48','response',180,'Doc «48»
Doc 48
customer fast big line big stream hash merge'),
(49,'https://example.org/doc/49','response',272,'Doc «49»
Doc 49
query batch data batch slow key column scan '),
(50,'https://example.org/doc/50','response',272,'Doc «50»
Doc 50
slow value window column data slow value col'),
(51,'https://example.org/doc/51','response',342,'Doc «51»
Doc 51
order spark filter hash query hash hash wind'),
(52,'https://example.org/doc/52','response',79,'Doc «52»
Doc 52
part join window part agg small column spark'),
(53,'https://example.org/doc/53','response',206,'Doc «53»
Doc 53
group slow table scan data part order value '),
(54,'https://example.org/doc/54','response',373,'Doc «54»
Doc 54
batch a table small column the scan stream k'),
(55,'https://example.org/doc/55','response',212,'Doc «55»
Doc 55
stream slow customer a row hash scan value s'),
(56,'https://example.org/doc/56','response',565,'Doc «56»
Doc 56
merge key part vector data order window spar'),
(57,'https://example.org/doc/57','response',463,'Doc «57»
Doc 57
hash the batch big scan a line stream a cust'),
(58,'https://example.org/doc/58','response',405,'Doc «58»
Doc 58
column stream spark hash group join key tabl'),
(59,'https://example.org/doc/59','response',134,'Doc «59»
Doc 59
join hash group join group big batch custome'),
(60,'https://example.org/doc/60','response',509,'Doc «60»
Doc 60
key sort data scan big agg customer value ve'),
(61,'https://example.org/doc/61','response',325,'Doc «61»
Doc 61
merge small small the order agg order table '),
(62,'https://example.org/doc/62','response',408,'Doc «62»
Doc 62
group a order value fast customer merge tabl'),
(63,'https://example.org/doc/63','response',545,'Doc «63»
Doc 63
scan small data slow scan query row slow big'),
(64,'https://example.org/doc/64','response',151,'Doc «64»
Doc 64
join agg join a table hash big sort filter s'),
(65,'https://example.org/doc/65','response',115,'Doc «65»
Doc 65
the filter line row merge table stream table'),
(66,'https://example.org/doc/66','response',368,'Doc «66»
Doc 66
a row customer column customer vector hash r'),
(67,'https://example.org/doc/67','response',349,'Doc «67»
Doc 67
key stream agg row vector data join key line'),
(68,'https://example.org/doc/68','response',202,'Doc «68»
Doc 68
key hash slow join value scan customer scan '),
(69,'https://example.org/doc/69','response',324,'Doc «69»
Doc 69
column agg stream window order query filter '),
(70,'https://example.org/doc/70','response',525,'Doc «70»
Doc 70
the column customer data stream slow window '),
(71,'https://example.org/doc/71','response',352,'Doc «71»
Doc 71
filter vector agg vector filter query data g'),
(72,'https://example.org/doc/72','response',246,'Doc «72»
Doc 72
hash sort filter customer join slow key filt'),
(73,'https://example.org/doc/73','response',519,'Doc «73»
Doc 73
join part data agg part line row small order'),
(74,'https://example.org/doc/74','response',64,'Doc «74»
Doc 74
data batch data key data column big key key '),
(75,'https://example.org/doc/75','response',328,'Doc «75»
Doc 75
customer row a big scan small batch agg smal'),
(76,'https://example.org/doc/76','response',398,'Doc «76»
Doc 76
table big column join key the merge join big'),
(77,'https://example.org/doc/77','response',335,'Doc «77»
Doc 77
a table window key batch slow column big ord'),
(78,'https://example.org/doc/78','response',249,'Doc «78»
Doc 78
data sort column stream big join agg small q'),
(79,'https://example.org/doc/79','response',79,'Doc «79»
Doc 79
sort filter the spark query group key stream'),
(80,'https://example.org/doc/80','response',188,'Doc «80»
Doc 80
part a vector hash big join the order big fi'),
(81,'https://example.org/doc/81','response',373,'Doc «81»
Doc 81
batch column big order column table order ta'),
(82,'https://example.org/doc/82','response',276,'Doc «82»
Doc 82
table batch merge small a key customer small'),
(83,'https://example.org/doc/83','response',104,'Doc «83»
Doc 83
value table hash query query line order batc'),
(84,'https://example.org/doc/84','response',419,'Doc «84»
Doc 84
hash part order hash scan group sort data sp'),
(85,'https://example.org/doc/85','response',171,'Doc «85»
Doc 85
row big table table part customer sort query'),
(86,'https://example.org/doc/86','response',154,'Doc «86»
Doc 86
value join merge window value value vector f'),
(87,'https://example.org/doc/87','response',144,'Doc «87»
Doc 87
query filter vector spark scan part join gro'),
(88,'https://example.org/doc/88','response',305,'Doc «88»
Doc 88
customer table group stream row scan row fas'),
(89,'https://example.org/doc/89','response',157,'Doc «89»
Doc 89
hash spark stream part table agg order group'),
(90,'https://example.org/doc/90','response',128,'Doc «90»
Doc 90
row data hash agg order the fast window a li'),
(91,'https://example.org/doc/91','response',447,'Doc «91»
Doc 91
batch small table spark query query a agg pa'),
(92,'https://example.org/doc/92','response',162,'Doc «92»
Doc 92
the spark query slow small table slow value '),
(93,'https://example.org/doc/93','response',146,'Doc «93»
Doc 93
vector column column vector a scan key data '),
(94,'https://example.org/doc/94','response',159,'Doc «94»
Doc 94
slow slow query scan customer batch big vect'),
(95,'https://example.org/doc/95','response',312,'Doc «95»
Doc 95
part part small row merge merge order hash b'),
(96,'https://example.org/doc/96','response',470,'Doc «96»
Doc 96
column line sort key window query merge colu'),
(97,'https://example.org/doc/97','response',336,'Doc «97»
Doc 97
scan key spark line a small agg value row bi'),
(98,'https://example.org/doc/98','response',542,'Doc «98»
Doc 98
spark scan spark table hash batch vector key'),
(99,'https://example.org/doc/99','response',212,'Doc «99»
Doc 99
column key hash value agg sort a spark filte'),
(100,'https://example.org/doc/100','response',479,'Doc «100»
Doc 100
batch data join scan table slow filter fil'),
(101,'https://example.org/doc/101','response',250,'Doc «101»
Doc 101
table join fast slow query customer join f'),
(102,'https://example.org/doc/102','response',533,'Doc «102»
Doc 102
customer vector key the filter merge hash '),
(103,'https://example.org/doc/103','response',545,'Doc «103»
Doc 103
customer query big batch scan scan big tab'),
(104,'https://example.org/doc/104','response',264,'Doc «104»
Doc 104
row sort value the hash data order merge s'),
(105,'https://example.org/doc/105','response',346,'Doc «105»
Doc 105
the fast column batch value hash filter sc'),
(106,'https://example.org/doc/106','response',88,'Doc «106»
Doc 106
small join fast vector join query sort row'),
(107,'https://example.org/doc/107','response',230,'Doc «107»
Doc 107
hash query group row line stream join wind'),
(108,'https://example.org/doc/108','response',104,'Doc «108»
Doc 108
table batch fast table key filter value a '),
(109,'https://example.org/doc/109','response',413,'Doc «109»
Doc 109
part spark line order fast group key colum'),
(110,'https://example.org/doc/110','response',72,'Doc «110»
Doc 110
scan merge part agg table key big merge sl'),
(111,'https://example.org/doc/111','response',547,'Doc «111»
Doc 111
merge merge part agg merge part agg key sm'),
(112,'https://example.org/doc/112','response',340,'Doc «112»
Doc 112
vector order the scan the vector window ba'),
(113,'https://example.org/doc/113','response',446,'Doc «113»
Doc 113
scan hash filter line agg batch query the '),
(114,'https://example.org/doc/114','response',225,'Doc «114»
Doc 114
customer row stream slow customer order fa'),
(115,'https://example.org/doc/115','response',150,'Doc «115»
Doc 115
row part key vector table customer fast ro'),
(116,'https://example.org/doc/116','response',80,'Doc «116»
Doc 116
small window part customer query filter sl'),
(117,'https://example.org/doc/117','response',264,'Doc «117»
Doc 117
scan group query query a query sort scan s'),
(118,'https://example.org/doc/118','response',414,'Doc «118»
Doc 118
table stream batch data customer stream ag'),
(119,'https://example.org/doc/119','response',105,'Doc «119»
Doc 119
column filter agg row agg vector part batc'),
(120,'https://example.org/doc/120','response',229,'Doc «120»
Doc 120
spark column vector stream key line value '),
(121,'https://example.org/doc/121','response',186,'Doc «121»
Doc 121
spark big batch column order value query d'),
(122,'https://example.org/doc/122','response',120,'Doc «122»
Doc 122
customer key customer spark merge slow big'),
(123,'https://example.org/doc/123','response',176,'Doc «123»
Doc 123
the stream order customer big join batch s'),
(124,'https://example.org/doc/124','response',329,'Doc «124»
Doc 124
slow agg stream column sort group data str'),
(125,'https://example.org/doc/125','response',203,'Doc «125»
Doc 125
fast the join part table order stream slow'),
(126,'https://example.org/doc/126','response',527,'Doc «126»
Doc 126
key hash line the merge customer spark ord'),
(127,'https://example.org/doc/127','response',452,'Doc «127»
Doc 127
part small fast table vector table data ha'),
(128,'https://example.org/doc/128','response',473,'Doc «128»
Doc 128
value filter hash scan data the batch data'),
(129,'https://example.org/doc/129','response',457,'Doc «129»
Doc 129
filter join the merge spark row merge filt'),
(130,'https://example.org/doc/130','response',168,'Doc «130»
Doc 130
spark table batch window value query line '),
(131,'https://example.org/doc/131','response',311,'Doc «131»
Doc 131
row merge join slow column order stream sc'),
(132,'https://example.org/doc/132','response',348,'Doc «132»
Doc 132
join row small a big a stream line spark t'),
(133,'https://example.org/doc/133','response',518,'Doc «133»
Doc 133
row customer column table fast key vector '),
(134,'https://example.org/doc/134','response',150,'Doc «134»
Doc 134
query filter vector spark scan part join g'),
(135,'https://example.org/doc/135','response',556,'Doc «135»
Doc 135
merge fast part customer spark slow big st'),
(136,'https://example.org/doc/136','response',352,'Doc «136»
Doc 136
a hash big join line row join merge agg qu'),
(137,'https://example.org/doc/137','response',251,'Doc «137»
Doc 137
line a query stream table column query col'),
(138,'https://example.org/doc/138','response',382,'Doc «138»
Doc 138
data filter key filter row data vector joi'),
(139,'https://example.org/doc/139','response',312,'Doc «139»
Doc 139
stream customer small small order order sl'),
(140,'https://example.org/doc/140','response',175,'Doc «140»
Doc 140
group agg big query filter the sort agg va'),
(141,'https://example.org/doc/141','response',450,'Doc «141»
Doc 141
scan a hash key value customer slow query '),
(142,'https://example.org/doc/142','response',530,'Doc «142»
Doc 142
the small query line customer slow filter '),
(143,'https://example.org/doc/143','response',429,'Doc «143»
Doc 143
a part filter scan slow spark key vector f'),
(144,'https://example.org/doc/144','response',107,'Doc «144»
Doc 144
column row row the key agg hash spark join'),
(145,'https://example.org/doc/145','response',419,'Doc «145»
Doc 145
slow batch hash filter spark sort order st'),
(146,'https://example.org/doc/146','response',147,'Doc «146»
Doc 146
vector spark the merge value vector merge '),
(147,'https://example.org/doc/147','response',460,'Doc «147»
Doc 147
group batch key small value stream hash ba'),
(148,'https://example.org/doc/148','response',215,'Doc «148»
Doc 148
value spark stream merge sort a filter row'),
(149,'https://example.org/doc/149','response',175,'Doc «149»
Doc 149
the row query batch query row spark part d'),
(150,'https://example.org/doc/150','response',292,'Doc «150»
Doc 150
sort join join vector query fast customer '),
(151,'https://example.org/doc/151','response',537,'Doc «151»
Doc 151
stream sort sort sort value agg join agg f'),
(152,'https://example.org/doc/152','response',236,'Doc «152»
Doc 152
fast merge row data slow batch agg a small'),
(153,'https://example.org/doc/153','response',451,'Doc «153»
Doc 153
column the the slow vector fast fast colum'),
(154,'https://example.org/doc/154','response',461,'Doc «154»
Doc 154
sort order value a column slow hash line s'),
(155,'https://example.org/doc/155','response',385,'Doc «155»
Doc 155
window join merge agg value agg query filt'),
(156,'https://example.org/doc/156','response',140,'Doc «156»
Doc 156
hash sort small slow big group order small'),
(157,'https://example.org/doc/157','response',109,'Doc «157»
Doc 157
slow hash batch line stream row merge smal'),
(158,'https://example.org/doc/158','response',124,'Doc «158»
Doc 158
hash customer table filter table value gro'),
(159,'https://example.org/doc/159','response',397,'Doc «159»
Doc 159
data table merge agg fast group query part'),
(160,'https://example.org/doc/160','response',264,'Doc «160»
Doc 160
batch filter the order order a query filte'),
(161,'https://example.org/doc/161','response',491,'Doc «161»
Doc 161
fast join key customer the sort table valu'),
(162,'https://example.org/doc/162','response',476,'Doc «162»
Doc 162
customer window order filter scan vector s'),
(163,'https://example.org/doc/163','response',275,'Doc «163»
Doc 163
row window value batch scan vector agg fas'),
(164,'https://example.org/doc/164','response',126,'Doc «164»
Doc 164
key table query part window filter stream '),
(165,'https://example.org/doc/165','response',126,'Doc «165»
Doc 165
slow value spark hash join big merge slow '),
(166,'https://example.org/doc/166','response',345,'Doc «166»
Doc 166
query column group agg filter value query '),
(167,'https://example.org/doc/167','response',493,'Doc «167»
Doc 167
key vector stream group spark table hash j'),
(168,'https://example.org/doc/168','response',246,'Doc «168»
Doc 168
small query slow customer slow query join '),
(169,'https://example.org/doc/169','response',416,'Doc «169»
Doc 169
window join value line customer line row c'),
(170,'https://example.org/doc/170','response',142,'Doc «170»
Doc 170
group column batch big customer join batch'),
(171,'https://example.org/doc/171','response',346,'Doc «171»
Doc 171
query big vector slow table slow line wind'),
(172,'https://example.org/doc/172','response',121,'Doc «172»
Doc 172
sort scan vector stream part scan row agg '),
(173,'https://example.org/doc/173','response',558,'Doc «173»
Doc 173
group row vector table data value key hash'),
(174,'https://example.org/doc/174','response',333,'Doc «174»
Doc 174
slow row query table agg hash spark line j'),
(175,'https://example.org/doc/175','response',176,'Doc «175»
Doc 175
group group order fast value sort column w'),
(176,'https://example.org/doc/176','response',509,'Doc «176»
Doc 176
hash agg a hash big data row value batch s'),
(177,'https://example.org/doc/177','response',281,'Doc «177»
Doc 177
the key query window agg spark table scan '),
(178,'https://example.org/doc/178','response',232,'Doc «178»
Doc 178
fast merge row data slow batch agg a small'),
(179,'https://example.org/doc/179','response',502,'Doc «179»
Doc 179
key small big data query part column slow '),
(180,'https://example.org/doc/180','response',203,'Doc «180»
Doc 180
agg query part merge filter customer spark'),
(181,'https://example.org/doc/181','response',127,'Doc «181»
Doc 181
filter part customer the customer table co'),
(182,'https://example.org/doc/182','response',361,'Doc «182»
Doc 182
agg key order row vector batch customer th'),
(183,'https://example.org/doc/183','response',117,'Doc «183»
Doc 183
window order join line batch query a join '),
(184,'https://example.org/doc/184','response',459,'Doc «184»
Doc 184
part a value query key table customer vect'),
(185,'https://example.org/doc/185','response',323,'Doc «185»
Doc 185
merge small small the order agg order tabl'),
(186,'https://example.org/doc/186','response',431,'Doc «186»
Doc 186
row table query scan vector order sort lin'),
(187,'https://example.org/doc/187','response',515,'Doc «187»
Doc 187
a group scan hash big filter agg the strea'),
(188,'https://example.org/doc/188','response',264,'Doc «188»
Doc 188
merge stream a window batch order spark li'),
(189,'https://example.org/doc/189','response',225,'Doc «189»
Doc 189
group window line slow value big query str'),
(190,'https://example.org/doc/190','response',446,'Doc «190»
Doc 190
table spark fast a hash value vector join '),
(191,'https://example.org/doc/191','response',136,'Doc «191»
Doc 191
customer merge scan batch fast small join '),
(192,'https://example.org/doc/192','response',150,'Doc «192»
Doc 192
filter column table part row join column t'),
(193,'https://example.org/doc/193','response',186,'Doc «193»
Doc 193
line join batch query key batch batch smal'),
(194,'https://example.org/doc/194','response',174,'Doc «194»
Doc 194
the scan big row query column a stream mer'),
(195,'https://example.org/doc/195','response',336,'Doc «195»
Doc 195
small scan small merge customer spark agg '),
(196,'https://example.org/doc/196','response',357,'Doc «196»
Doc 196
filter big column slow agg batch query mer'),
(197,'https://example.org/doc/197','response',540,'Doc «197»
Doc 197
a query merge column the column big line f'),
(198,'https://example.org/doc/198','response',272,'Doc «198»
Doc 198
slow hash join agg stream small agg line f'),
(199,'https://example.org/doc/199','response',172,'Doc «199»
Doc 199
column query agg slow sort table the data '),
(200,'https://example.org/doc/200','response',321,'Doc «200»
Doc 200
part hash agg value big slow stream query '),
(201,'https://example.org/doc/201','response',333,'Doc «201»
Doc 201
line merge batch value group filter fast k'),
(202,'https://example.org/doc/202','response',499,'Doc «202»
Doc 202
join key window hash query key data table '),
(203,'https://example.org/doc/203','response',146,'Doc «203»
Doc 203
column table line batch slow query value s'),
(204,'https://example.org/doc/204','response',135,'Doc «204»
Doc 204
vector group group join table join agg par'),
(205,'https://example.org/doc/205','response',394,'Doc «205»
Doc 205
join hash agg batch the big window data ve'),
(206,'https://example.org/doc/206','response',148,'Doc «206»
Doc 206
key the slow small join merge query big ta'),
(207,'https://example.org/doc/207','response',403,'Doc «207»
Doc 207
merge big join batch scan vector part tabl'),
(208,'https://example.org/doc/208','response',133,'Doc «208»
Doc 208
hash order the line key data key line stre'),
(209,'https://example.org/doc/209','response',241,'Doc «209»
Doc 209
big spark fast sort group big fast hash ha'),
(210,'https://example.org/doc/210','response',533,'Doc «210»
Doc 210
customer batch window column data order sm'),
(211,'https://example.org/doc/211','response',297,'Doc «211»
Doc 211
column key line sort spark big query windo'),
(212,'https://example.org/doc/212','response',272,'Doc «212»
Doc 212
vector small hash group customer small vec'),
(213,'https://example.org/doc/213','response',485,'Doc «213»
Doc 213
fast part scan line column agg table table'),
(214,'https://example.org/doc/214','response',87,'Doc «214»
Doc 214
data query part the customer scan query wi'),
(215,'https://example.org/doc/215','response',545,'Doc «215»
Doc 215
slow the batch batch a customer query filt'),
(216,'https://example.org/doc/216','response',547,'Doc «216»
Doc 216
column group spark sort value customer a s'),
(217,'https://example.org/doc/217','response',368,'Doc «217»
Doc 217
table part key sort column key line hash s'),
(218,'https://example.org/doc/218','response',473,'Doc «218»
Doc 218
data line table small value stream stream '),
(219,'https://example.org/doc/219','response',193,'Doc «219»
Doc 219
scan order customer big vector scan custom'),
(220,'https://example.org/doc/220','response',571,'Doc «220»
Doc 220
part sort group column data agg vector ord'),
(221,'https://example.org/doc/221','response',239,'Doc «221»
Doc 221
join order value key vector stream custome'),
(222,'https://example.org/doc/222','response',279,'Doc «222»
Doc 222
vector spark window scan line part table c'),
(223,'https://example.org/doc/223','response',477,'Doc «223»
Doc 223
table vector group the agg table part part'),
(224,'https://example.org/doc/224','response',460,'Doc «224»
Doc 224
scan part batch customer group join window'),
(225,'https://example.org/doc/225','response',437,'Doc «225»
Doc 225
small join agg big value scan small key co'),
(226,'https://example.org/doc/226','response',127,'Doc «226»
Doc 226
part vector small the spark order order ta'),
(227,'https://example.org/doc/227','response',486,'Doc «227»
Doc 227
join part table filter agg small hash valu'),
(228,'https://example.org/doc/228','response',482,'Doc «228»
Doc 228
hash fast window vector row fast big sort '),
(229,'https://example.org/doc/229','response',427,'Doc «229»
Doc 229
the order join group join order the part v'),
(230,'https://example.org/doc/230','response',329,'Doc «230»
Doc 230
the query value vector spark group order k'),
(231,'https://example.org/doc/231','response',173,'Doc «231»
Doc 231
a part window slow spark table fast filter'),
(232,'https://example.org/doc/232','response',334,'Doc «232»
Doc 232
key column a hash join big sort spark vect'),
(233,'https://example.org/doc/233','response',476,'Doc «233»
Doc 233
join data data query join sort merge row h'),
(234,'https://example.org/doc/234','response',362,'Doc «234»
Doc 234
a key batch query merge merge big big smal'),
(235,'https://example.org/doc/235','response',242,'Doc «235»
Doc 235
key fast customer batch window row group q'),
(236,'https://example.org/doc/236','response',80,'Doc «236»
Doc 236
table column agg join group data line sort'),
(237,'https://example.org/doc/237','response',434,'Doc «237»
Doc 237
part the table batch line the table line g'),
(238,'https://example.org/doc/238','response',275,'Doc «238»
Doc 238
query query part slow order key value fast'),
(239,'https://example.org/doc/239','response',182,'Doc «239»
Doc 239
fast part batch filter row vector window w'),
(240,'https://example.org/doc/240','response',398,'Doc «240»
Doc 240
the fast fast fast stream slow sort group '),
(241,'https://example.org/doc/241','response',529,'Doc «241»
Doc 241
a key column value spark spark line batch '),
(242,'https://example.org/doc/242','response',406,'Doc «242»
Doc 242
join sort vector filter merge value order '),
(243,'https://example.org/doc/243','response',196,'Doc «243»
Doc 243
hash merge batch a window filter sort cust'),
(244,'https://example.org/doc/244','response',389,'Doc «244»
Doc 244
query order part vector value customer col'),
(245,'https://example.org/doc/245','response',484,'Doc «245»
Doc 245
the spark join stream a small order merge '),
(246,'https://example.org/doc/246','response',193,'Doc «246»
Doc 246
agg column part slow scan the merge key so'),
(247,'https://example.org/doc/247','response',448,'Doc «247»
Doc 247
slow order stream a the fast order table b'),
(248,'https://example.org/doc/248','response',464,'Doc «248»
Doc 248
customer batch query agg slow window group'),
(249,'https://example.org/doc/249','response',449,'Doc «249»
Doc 249
order table key key filter row the a a row'),
(250,'https://example.org/doc/250','response',265,'Doc «250»
Doc 250
value spark order filter vector batch line'),
(251,'https://example.org/doc/251','response',541,'Doc «251»
Doc 251
part window fast group merge spark line da'),
(252,'https://example.org/doc/252','response',270,'Doc «252»
Doc 252
spark window filter value key vector hash '),
(253,'https://example.org/doc/253','response',215,'Doc «253»
Doc 253
key query merge sort slow scan agg sort wi'),
(254,'https://example.org/doc/254','response',121,'Doc «254»
Doc 254
key sort table sort vector part hash sort '),
(255,'https://example.org/doc/255','response',175,'Doc «255»
Doc 255
row spark slow merge customer big spark cu'),
(256,'https://example.org/doc/256','response',80,'Doc «256»
Doc 256
group merge query scan sort small data has'),
(257,'https://example.org/doc/257','response',132,'Doc «257»
Doc 257
the value sort vector agg scan merge batch'),
(258,'https://example.org/doc/258','response',414,'Doc «258»
Doc 258
small small the merge batch join row small'),
(259,'https://example.org/doc/259','response',277,'Doc «259»
Doc 259
line data slow data a vector scan customer'),
(260,'https://example.org/doc/260','response',152,'Doc «260»
Doc 260
order part slow big hash table data data t'),
(261,'https://example.org/doc/261','response',490,'Doc «261»
Doc 261
a data small hash big row fast window slow'),
(262,'https://example.org/doc/262','response',274,'Doc «262»
Doc 262
a column data hash window spark part join '),
(263,'https://example.org/doc/263','response',465,'Doc «263»
Doc 263
data a big value table batch fast agg join'),
(264,'https://example.org/doc/264','response',562,'Doc «264»
Doc 264
table order scan scan part merge column co'),
(265,'https://example.org/doc/265','response',286,'Doc «265»
Doc 265
table hash join big stream part column has'),
(266,'https://example.org/doc/266','response',243,'Doc «266»
Doc 266
line key filter join group the key custome'),
(267,'https://example.org/doc/267','response',442,'Doc «267»
Doc 267
merge group part scan row value column bat'),
(268,'https://example.org/doc/268','response',234,'Doc «268»
Doc 268
data join stream a row the join the table '),
(269,'https://example.org/doc/269','response',485,'Doc «269»
Doc 269
data scan slow slow hash spark order windo'),
(270,'https://example.org/doc/270','response',517,'Doc «270»
Doc 270
column filter row merge a window key scan '),
(271,'https://example.org/doc/271','response',313,'Doc «271»
Doc 271
window spark sort scan agg spark merge col'),
(272,'https://example.org/doc/272','response',504,'Doc «272»
Doc 272
slow fast join part filter data group orde'),
(273,'https://example.org/doc/273','response',175,'Doc «273»
Doc 273
agg table window scan table part column qu'),
(274,'https://example.org/doc/274','response',555,'Doc «274»
Doc 274
window sort the sort big slow part data ke'),
(275,'https://example.org/doc/275','response',67,'Doc «275»
Doc 275
a row a window merge hash window group ord'),
(276,'https://example.org/doc/276','response',556,'Doc «276»
Doc 276
window hash small customer customer vector'),
(277,'https://example.org/doc/277','response',181,'Doc «277»
Doc 277
query spark query spark spark key big colu'),
(278,'https://example.org/doc/278','response',412,'Doc «278»
Doc 278
row table column spark hash merge table ro'),
(279,'https://example.org/doc/279','response',299,'Doc «279»
Doc 279
value a slow small batch fast part hash ag'),
(280,'https://example.org/doc/280','response',488,'Doc «280»
Doc 280
scan window value fast agg table stream da'),
(281,'https://example.org/doc/281','response',189,'Doc «281»
Doc 281
row key slow merge customer group key orde'),
(282,'https://example.org/doc/282','response',196,'Doc «282»
Doc 282
a column scan small stream a column data j'),
(283,'https://example.org/doc/283','response',489,'Doc «283»
Doc 283
customer hash customer agg small window sm'),
(284,'https://example.org/doc/284','response',296,'Doc «284»
Doc 284
batch agg data line value slow hash sort w'),
(285,'https://example.org/doc/285','response',530,'Doc «285»
Doc 285
group fast fast data row data stream part '),
(286,'https://example.org/doc/286','response',276,'Doc «286»
Doc 286
value a join query row query table filter '),
(287,'https://example.org/doc/287','response',119,'Doc «287»
Doc 287
customer merge sort group join the slow sp'),
(288,'https://example.org/doc/288','response',194,'Doc «288»
Doc 288
a key part scan scan customer sort filter '),
(289,'https://example.org/doc/289','response',242,'Doc «289»
Doc 289
a group stream merge merge window window c'),
(290,'https://example.org/doc/290','response',548,'Doc «290»
Doc 290
spark scan spark table hash batch vector k'),
(291,'https://example.org/doc/291','response',435,'Doc «291»
Doc 291
join key scan spark query part small row h'),
(292,'https://example.org/doc/292','response',476,'Doc «292»
Doc 292
batch merge query fast vector slow line qu'),
(293,'https://example.org/doc/293','response',403,'Doc «293»
Doc 293
column stream spark hash group join key ta'),
(294,'https://example.org/doc/294','response',488,'Doc «294»
Doc 294
row hash agg value column merge stream sor'),
(295,'https://example.org/doc/295','response',204,'Doc «295»
Doc 295
order filter query key vector query scan s'),
(296,'https://example.org/doc/296','response',377,'Doc «296»
Doc 296
batch fast join vector big vector filter s'),
(297,'https://example.org/doc/297','response',340,'Doc «297»
Doc 297
part key table row data order key merge co'),
(298,'https://example.org/doc/298','response',207,'Doc «298»
Doc 298
order filter vector batch vector data hash'),
(299,'https://example.org/doc/299','response',520,'Doc «299»
Doc 299
query table spark data join key big vector'),
(300,'https://example.org/doc/300','response',234,'Doc «300»
Doc 300
vector vector stream stream fast the batch'),
(301,'https://example.org/doc/301','response',526,'Doc «301»
Doc 301
group fast fast data row data stream part '),
(302,'https://example.org/doc/302','response',502,'Doc «302»
Doc 302
table a join fast spark column spark batch'),
(303,'https://example.org/doc/303','response',472,'Doc «303»
Doc 303
customer small filter hash key key order m'),
(304,'https://example.org/doc/304','response',237,'Doc «304»
Doc 304
row column value batch query query key big'),
(305,'https://example.org/doc/305','response',81,'Doc «305»
Doc 305
filter stream agg small filter batch scan '),
(306,'https://example.org/doc/306','response',439,'Doc «306»
Doc 306
order value stream table value vector tabl'),
(307,'https://example.org/doc/307','response',320,'Doc «307»
Doc 307
the big filter group small join vector key'),
(308,'https://example.org/doc/308','response',115,'Doc «308»
Doc 308
batch scan window value filter join stream'),
(309,'https://example.org/doc/309','response',256,'Doc «309»
Doc 309
row small column agg value group filter sm'),
(310,'https://example.org/doc/310','response',166,'Doc «310»
Doc 310
merge join table a slow part table column '),
(311,'https://example.org/doc/311','response',513,'Doc «311»
Doc 311
merge join vector the order agg hash windo'),
(312,'https://example.org/doc/312','response',387,'Doc «312»
Doc 312
sort filter table agg big spark scan key l'),
(313,'https://example.org/doc/313','response',105,'Doc «313»
Doc 313
filter scan part a data sort a value value'),
(314,'https://example.org/doc/314','response',208,'Doc «314»
Doc 314
customer merge agg stream window data part'),
(315,'https://example.org/doc/315','response',478,'Doc «315»
Doc 315
group small data line agg spark row merge '),
(316,'https://example.org/doc/316','response',425,'Doc «316»
Doc 316
scan data a vector key small fast a spark '),
(317,'https://example.org/doc/317','response',426,'Doc «317»
Doc 317
merge value data batch filter hash hash cu'),
(318,'https://example.org/doc/318','response',474,'Doc «318»
Doc 318
stream customer row hash column scan strea'),
(319,'https://example.org/doc/319','response',531,'Doc «319»
Doc 319
agg stream fast stream order merge merge a'),
(320,'https://example.org/doc/320','response',423,'Doc «320»
Doc 320
the big column merge fast a line row agg b'),
(321,'https://example.org/doc/321','response',310,'Doc «321»
Doc 321
stream vector sort column data stream the '),
(322,'https://example.org/doc/322','response',273,'Doc «322»
Doc 322
table window big column fast column key sm'),
(323,'https://example.org/doc/323','response',349,'Doc «323»
Doc 323
query column group agg filter value query '),
(324,'https://example.org/doc/324','response',246,'Doc «324»
Doc 324
group line slow window slow spark order th'),
(325,'https://example.org/doc/325','response',346,'Doc «325»
Doc 325
table small value column merge hash column'),
(326,'https://example.org/doc/326','response',216,'Doc «326»
Doc 326
scan key hash merge line key vector value '),
(327,'https://example.org/doc/327','response',199,'Doc «327»
Doc 327
group join merge row key stream fast row s'),
(328,'https://example.org/doc/328','response',513,'Doc «328»
Doc 328
join row big stream small the customer gro'),
(329,'https://example.org/doc/329','response',371,'Doc «329»
Doc 329
merge batch big row sort hash scan window '),
(330,'https://example.org/doc/330','response',334,'Doc «330»
Doc 330
big agg order the group hash data the filt'),
(331,'https://example.org/doc/331','response',318,'Doc «331»
Doc 331
customer value small join query row key wi'),
(332,'https://example.org/doc/332','response',225,'Doc «332»
Doc 332
spark column vector stream key line value '),
(333,'https://example.org/doc/333','response',195,'Doc «333»
Doc 333
hash query data big table agg merge spark '),
(334,'https://example.org/doc/334','response',502,'Doc «334»
Doc 334
join key value small join row a data query'),
(335,'https://example.org/doc/335','response',343,'Doc «335»
Doc 335
column slow filter data customer agg agg h'),
(336,'https://example.org/doc/336','response',394,'Doc «336»
Doc 336
table hash customer column query line scan'),
(337,'https://example.org/doc/337','response',260,'Doc «337»
Doc 337
filter part column group vector merge key '),
(338,'https://example.org/doc/338','response',109,'Doc «338»
Doc 338
data join query spark value row table hash'),
(339,'https://example.org/doc/339','response',205,'Doc «339»
Doc 339
vector vector column stream key scan part '),
(340,'https://example.org/doc/340','response',265,'Doc «340»
Doc 340
batch group hash group data row customer w'),
(341,'https://example.org/doc/341','response',445,'Doc «341»
Doc 341
part part small row scan fast customer slo'),
(342,'https://example.org/doc/342','response',134,'Doc «342»
Doc 342
value vector hash key vector group agg val'),
(343,'https://example.org/doc/343','response',173,'Doc «343»
Doc 343
row slow data data merge small part data a'),
(344,'https://example.org/doc/344','response',435,'Doc «344»
Doc 344
row key query part order hash agg customer'),
(345,'https://example.org/doc/345','response',341,'Doc «345»
Doc 345
line data vector sort line scan filter win'),
(346,'https://example.org/doc/346','response',427,'Doc «346»
Doc 346
fast data customer filter group query batc'),
(347,'https://example.org/doc/347','response',300,'Doc «347»
Doc 347
filter query agg query fast spark big the '),
(348,'https://example.org/doc/348','response',149,'Doc «348»
Doc 348
batch order stream batch value batch value'),
(349,'https://example.org/doc/349','response',475,'Doc «349»
Doc 349
query row join hash agg column big agg val'),
(350,'https://example.org/doc/350','response',485,'Doc «350»
Doc 350
batch join sort value query sort sort stre'),
(351,'https://example.org/doc/351','response',386,'Doc «351»
Doc 351
a order data query query fast vector data '),
(352,'https://example.org/doc/352','response',554,'Doc «352»
Doc 352
a fast order part the sort small group gro'),
(353,'https://example.org/doc/353','response',333,'Doc «353»
Doc 353
customer a batch agg order spark sort row '),
(354,'https://example.org/doc/354','response',444,'Doc «354»
Doc 354
customer slow sort vector spark batch quer'),
(355,'https://example.org/doc/355','response',371,'Doc «355»
Doc 355
spark order scan the batch the group value'),
(356,'https://example.org/doc/356','response',377,'Doc «356»
Doc 356
key key fast order small group value big b'),
(357,'https://example.org/doc/357','response',271,'Doc «357»
Doc 357
hash a sort filter key hash batch order li'),
(358,'https://example.org/doc/358','response',77,'Doc «358»
Doc 358
join line fast join spark part batch merge'),
(359,'https://example.org/doc/359','response',346,'Doc «359»
Doc 359
sort part part small slow join line sort p'),
(360,'https://example.org/doc/360','response',461,'Doc «360»
Doc 360
vector value small data merge group hash s'),
(361,'https://example.org/doc/361','response',381,'Doc «361»
Doc 361
window row scan scan table vector row colu'),
(362,'https://example.org/doc/362','response',99,'Doc «362»
Doc 362
slow data group query spark big join vecto'),
(363,'https://example.org/doc/363','response',375,'Doc «363»
Doc 363
merge table column vector part batch vecto'),
(364,'https://example.org/doc/364','response',288,'Doc «364»
Doc 364
fast column column line big batch order or'),
(365,'https://example.org/doc/365','response',85,'Doc «365»
Doc 365
vector spark agg part merge line fast cust'),
(366,'https://example.org/doc/366','response',329,'Doc «366»
Doc 366
line column value order line table vector '),
(367,'https://example.org/doc/367','response',231,'Doc «367»
Doc 367
scan key vector a row hash stream row hash'),
(368,'https://example.org/doc/368','response',91,'Doc «368»
Doc 368
agg fast value batch spark sort hash line '),
(369,'https://example.org/doc/369','response',291,'Doc «369»
Doc 369
sort join join small group customer hash s'),
(370,'https://example.org/doc/370','response',264,'Doc «370»
Doc 370
part spark table order customer column tab'),
(371,'https://example.org/doc/371','response',368,'Doc «371»
Doc 371
window big row window big small the column'),
(372,'https://example.org/doc/372','response',160,'Doc «372»
Doc 372
column big group sort fast agg agg row key'),
(373,'https://example.org/doc/373','response',406,'Doc «373»
Doc 373
merge line batch table the filter row a ro'),
(374,'https://example.org/doc/374','response',200,'Doc «374»
Doc 374
order filter query key vector query scan s'),
(375,'https://example.org/doc/375','response',361,'Doc «375»
Doc 375
stream row row order the slow merge key pa'),
(376,'https://example.org/doc/376','response',385,'Doc «376»
Doc 376
data join join scan vector sort stream fil'),
(377,'https://example.org/doc/377','response',252,'Doc «377»
Doc 377
hash sort filter customer join slow key fi'),
(378,'https://example.org/doc/378','response',355,'Doc «378»
Doc 378
sort small table scan stream order spark b'),
(379,'https://example.org/doc/379','response',421,'Doc «379»
Doc 379
spark stream fast join window hash vector '),
(380,'https://example.org/doc/380','response',461,'Doc «380»
Doc 380
window the sort small data stream small ha'),
(381,'https://example.org/doc/381','response',371,'Doc «381»
Doc 381
scan join data batch agg agg filter batch '),
(382,'https://example.org/doc/382','response',150,'Doc «382»
Doc 382
customer slow key data filter a spark grou'),
(383,'https://example.org/doc/383','response',272,'Doc «383»
Doc 383
the a column batch customer value vector l'),
(384,'https://example.org/doc/384','response',110,'Doc «384»
Doc 384
key agg part sort join sort big small cust'),
(385,'https://example.org/doc/385','response',417,'Doc «385»
Doc 385
customer big scan line customer merge hash'),
(386,'https://example.org/doc/386','response',489,'Doc «386»
Doc 386
filter hash row line join query window dat'),
(387,'https://example.org/doc/387','response',226,'Doc «387»
Doc 387
hash query group row line stream join wind'),
(388,'https://example.org/doc/388','response',363,'Doc «388»
Doc 388
line sort merge group filter sort order sp'),
(389,'https://example.org/doc/389','response',170,'Doc «389»
Doc 389
merge join table a slow part table column '),
(390,'https://example.org/doc/390','response',155,'Doc «390»
Doc 390
slow batch row a a the query merge custome'),
(391,'https://example.org/doc/391','response',256,'Doc «391»
Doc 391
window order spark column query order line'),
(392,'https://example.org/doc/392','response',153,'Doc «392»
Doc 392
vector group column order window row key s'),
(393,'https://example.org/doc/393','response',483,'Doc «393»
Doc 393
fast merge sort fast fast slow sort scan d'),
(394,'https://example.org/doc/394','response',422,'Doc «394»
Doc 394
query customer join group part column fast'),
(395,'https://example.org/doc/395','response',497,'Doc «395»
Doc 395
group customer table order hash customer a'),
(396,'https://example.org/doc/396','response',266,'Doc «396»
Doc 396
big small batch small filter data data has'),
(397,'https://example.org/doc/397','response',312,'Doc «397»
Doc 397
table key data merge group agg hash slow k'),
(398,'https://example.org/doc/398','response',123,'Doc «398»
Doc 398
sort group table column merge line slow bi'),
(399,'https://example.org/doc/399','response',327,'Doc «399»
Doc 399
column key sort window stream row customer'),
(400,'https://example.org/doc/400','response',152,'Doc «400»
Doc 400
data line line query batch the slow window'),
(401,'https://example.org/doc/401','response',456,'Doc «401»
Doc 401
key join the a line line batch window filt'),
(402,'https://example.org/doc/402','response',178,'Doc «402»
Doc 402
big scan sort row part line customer group'),
(403,'https://example.org/doc/403','response',491,'Doc «403»
Doc 403
order window join filter fast hash fast me'),
(404,'https://example.org/doc/404','response',239,'Doc «404»
Doc 404
value slow data stream agg stream join tab'),
(405,'https://example.org/doc/405','response',332,'Doc «405»
Doc 405
hash customer key part stream big table co'),
(406,'https://example.org/doc/406','response',478,'Doc «406»
Doc 406
table customer hash vector value a order m'),
(407,'https://example.org/doc/407','response',126,'Doc «407»
Doc 407
hash table agg merge big key stream the or'),
(408,'https://example.org/doc/408','response',105,'Doc «408»
Doc 408
query query spark part sort slow batch lin'),
(409,'https://example.org/doc/409','response',291,'Doc «409»
Doc 409
small key a spark window hash small stream'),
(410,'https://example.org/doc/410','response',431,'Doc «410»
Doc 410
row order a table window value small sort '),
(411,'https://example.org/doc/411','response',429,'Doc «411»
Doc 411
vector row spark a hash agg stream small o'),
(412,'https://example.org/doc/412','response',383,'Doc «412»
Doc 412
agg row fast the table scan batch query co'),
(413,'https://example.org/doc/413','response',446,'Doc «413»
Doc 413
merge group part scan row value column bat'),
(414,'https://example.org/doc/414','response',426,'Doc «414»
Doc 414
part batch slow window small part column p'),
(415,'https://example.org/doc/415','response',331,'Doc «415»
Doc 415
the customer spark slow a batch slow colum'),
(416,'https://example.org/doc/416','response',305,'Doc «416»
Doc 416
key query order sort the slow sort spark m'),
(417,'https://example.org/doc/417','response',538,'Doc «417»
Doc 417
window query customer merge customer batch'),
(418,'https://example.org/doc/418','response',457,'Doc «418»
Doc 418
agg row order batch line row small batch p'),
(419,'https://example.org/doc/419','response',132,'Doc «419»
Doc 419
row window data filter small slow join bat'),
(420,'https://example.org/doc/420','response',479,'Doc «420»
Doc 420
fast merge sort fast fast slow sort scan d'),
(421,'https://example.org/doc/421','response',478,'Doc «421»
Doc 421
key line sort small row query window spark'),
(422,'https://example.org/doc/422','response',383,'Doc «422»
Doc 422
join group window group value batch row da'),
(423,'https://example.org/doc/423','response',381,'Doc «423»
Doc 423
join order part group merge customer spark'),
(424,'https://example.org/doc/424','response',427,'Doc «424»
Doc 424
join sort merge row stream part fast the t'),
(425,'https://example.org/doc/425','response',149,'Doc «425»
Doc 425
a slow line join vector spark batch column'),
(426,'https://example.org/doc/426','response',470,'Doc «426»
Doc 426
merge fast sort fast value order batch sma'),
(427,'https://example.org/doc/427','response',438,'Doc «427»
Doc 427
a key window small data column part part s'),
(428,'https://example.org/doc/428','response',297,'Doc «428»
Doc 428
filter slow row sort group row fast big ha'),
(429,'https://example.org/doc/429','response',555,'Doc «429»
Doc 429
query data column key key a batch big fast'),
(430,'https://example.org/doc/430','response',417,'Doc «430»
Doc 430
customer sort value spark big sort agg tab'),
(431,'https://example.org/doc/431','response',325,'Doc «431»
Doc 431
vector spark big order slow part hash orde'),
(432,'https://example.org/doc/432','response',377,'Doc «432»
Doc 432
scan hash agg table small stream vector qu'),
(433,'https://example.org/doc/433','response',194,'Doc «433»
Doc 433
the slow join table batch merge slow custo'),
(434,'https://example.org/doc/434','response',441,'Doc «434»
Doc 434
column query key big vector filter line fa'),
(435,'https://example.org/doc/435','response',185,'Doc «435»
Doc 435
part stream agg scan table column fast sor'),
(436,'https://example.org/doc/436','response',295,'Doc «436»
Doc 436
group row window agg sort fast row the par'),
(437,'https://example.org/doc/437','response',458,'Doc «437»
Doc 437
order data value fast batch row customer t'),
(438,'https://example.org/doc/438','response',190,'Doc «438»
Doc 438
fast line order value merge part column bi'),
(439,'https://example.org/doc/439','response',202,'Doc «439»
Doc 439
group line batch small batch join group sp'),
(440,'https://example.org/doc/440','response',261,'Doc «440»
Doc 440
customer order the join part sort order fi'),
(441,'https://example.org/doc/441','response',560,'Doc «441»
Doc 441
slow window small filter merge order order'),
(442,'https://example.org/doc/442','response',473,'Doc «442»
Doc 442
stream query order value part query spark '),
(443,'https://example.org/doc/443','response',298,'Doc «443»
Doc 443
big filter a the row slow sort a a filter '),
(444,'https://example.org/doc/444','response',437,'Doc «444»
Doc 444
key filter vector join order batch key val'),
(445,'https://example.org/doc/445','response',325,'Doc «445»
Doc 445
small scan data agg query fast row scan sp'),
(446,'https://example.org/doc/446','response',150,'Doc «446»
Doc 446
data data sort agg scan value the hash col'),
(447,'https://example.org/doc/447','response',523,'Doc «447»
Doc 447
the column customer data stream slow windo'),
(448,'https://example.org/doc/448','response',304,'Doc «448»
Doc 448
slow line join group filter key sort group'),
(449,'https://example.org/doc/449','response',195,'Doc «449»
Doc 449
filter the scan key row row spark window a'),
(450,'https://example.org/doc/450','response',160,'Doc «450»
Doc 450
the spark query slow small table slow valu'),
(451,'https://example.org/doc/451','response',130,'Doc «451»
Doc 451
a part vector hash key vector join data sc'),
(452,'https://example.org/doc/452','response',376,'Doc «452»
Doc 452
row scan small the fast group stream key m'),
(453,'https://example.org/doc/453','response',537,'Doc «453»
Doc 453
filter table part window stream big hash s'),
(454,'https://example.org/doc/454','response',171,'Doc «454»
Doc 454
stream row customer a batch small stream j'),
(455,'https://example.org/doc/455','response',77,'Doc «455»
Doc 455
table small sort order small hash stream d'),
(456,'https://example.org/doc/456','response',132,'Doc «456»
Doc 456
fast join key hash spark key part join sma'),
(457,'https://example.org/doc/457','response',220,'Doc «457»
Doc 457
scan key hash merge line key vector value '),
(458,'https://example.org/doc/458','response',341,'Doc «458»
Doc 458
key line join order value query customer s'),
(459,'https://example.org/doc/459','response',394,'Doc «459»
Doc 459
batch vector row stream key big row a vect'),
(460,'https://example.org/doc/460','response',279,'Doc «460»
Doc 460
agg scan column key spark row vector table'),
(461,'https://example.org/doc/461','response',390,'Doc «461»
Doc 461
row merge vector big order line spark data'),
(462,'https://example.org/doc/462','response',345,'Doc «462»
Doc 462
key line join order value query customer s'),
(463,'https://example.org/doc/463','response',509,'Doc «463»
Doc 463
filter the column table big key row data f'),
(464,'https://example.org/doc/464','response',222,'Doc «464»
Doc 464
batch vector part the the table customer k'),
(465,'https://example.org/doc/465','response',338,'Doc «465»
Doc 465
line stream query customer agg filter smal'),
(466,'https://example.org/doc/466','response',489,'Doc «466»
Doc 466
batch data hash a value a agg batch vector'),
(467,'https://example.org/doc/467','response',378,'Doc «467»
Doc 467
sort data data window agg filter stream or'),
(468,'https://example.org/doc/468','response',225,'Doc «468»
Doc 468
column slow key order key scan customer ro'),
(469,'https://example.org/doc/469','response',75,'Doc «469»
Doc 469
row line batch part query query small stre'),
(470,'https://example.org/doc/470','response',250,'Doc «470»
Doc 470
agg customer key batch query data spark va'),
(471,'https://example.org/doc/471','response',353,'Doc «471»
Doc 471
batch small vector table small small row w'),
(472,'https://example.org/doc/472','response',226,'Doc «472»
Doc 472
agg stream stream fast filter fast group s'),
(473,'https://example.org/doc/473','response',311,'Doc «473»
Doc 473
batch agg sort sort vector sort big batch '),
(474,'https://example.org/doc/474','response',374,'Doc «474»
Doc 474
order query key slow the fast spark key cu'),
(475,'https://example.org/doc/475','response',95,'Doc «475»
Doc 475
line spark small key merge sort part query'),
(476,'https://example.org/doc/476','response',102,'Doc «476»
Doc 476
hash vector part spark batch small a query'),
(477,'https://example.org/doc/477','response',169,'Doc «477»
Doc 477
line slow value window line window agg win'),
(478,'https://example.org/doc/478','response',308,'Doc «478»
Doc 478
window line join the batch vector value fi'),
(479,'https://example.org/doc/479','response',407,'Doc «479»
Doc 479
sort merge line hash data sort spark vecto'),
(480,'https://example.org/doc/480','response',377,'Doc «480»
Doc 480
part key part order row order sort table a'),
(481,'https://example.org/doc/481','response',103,'Doc «481»
Doc 481
line vector value agg group small row valu'),
(482,'https://example.org/doc/482','response',183,'Doc «482»
Doc 482
filter merge customer sort agg small key t'),
(483,'https://example.org/doc/483','response',263,'Doc «483»
Doc 483
join table slow join customer a spark agg '),
(484,'https://example.org/doc/484','response',239,'Doc «484»
Doc 484
value fast big row a scan the big vector v'),
(485,'https://example.org/doc/485','response',147,'Doc «485»
Doc 485
spark column window data query value group'),
(486,'https://example.org/doc/486','response',189,'Doc «486»
Doc 486
part stream agg scan table column fast sor'),
(487,'https://example.org/doc/487','response',339,'Doc «487»
Doc 487
key window small key a small row stream pa'),
(488,'https://example.org/doc/488','response',223,'Doc «488»
Doc 488
value join column join column window vecto'),
(489,'https://example.org/doc/489','response',335,'Doc «489»
Doc 489
customer scan order fast sort small key fi'),
(490,'https://example.org/doc/490','response',289,'Doc «490»
Doc 490
window query a the sort part slow the hash'),
(491,'https://example.org/doc/491','response',386,'Doc «491»
Doc 491
column batch data table merge column scan '),
(492,'https://example.org/doc/492','response',95,'Doc «492»
Doc 492
value table vector merge merge window grou'),
(493,'https://example.org/doc/493','response',483,'Doc «493»
Doc 493
filter join hash join query row customer r'),
(494,'https://example.org/doc/494','response',224,'Doc «494»
Doc 494
sort table big stream merge row row slow s'),
(495,'https://example.org/doc/495','response',402,'Doc «495»
Doc 495
filter hash spark table the hash group slo'),
(496,'https://example.org/doc/496','response',475,'Doc «496»
Doc 496
the query filter column group vector the s'),
(497,'https://example.org/doc/497','response',141,'Doc «497»
Doc 497
window stream vector merge column order pa'),
(498,'https://example.org/doc/498','response',503,'Doc «498»
Doc 498
value fast part scan fast value row row qu'),
(499,'https://example.org/doc/499','response',184,'Doc «499»
Doc 499
line big a small group the window sort gro')
) AS t(doc_id, target_uri, warc_type, n_chars_ext, head60)
ORDER BY doc_id